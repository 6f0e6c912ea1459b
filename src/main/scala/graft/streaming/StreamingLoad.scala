package graft.streaming

import graft.model.{ConnectionSpec, LoadStep}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Streaming LoadStep dispatch — the sink half of declarative streaming
  * pipelines (the extract half is `Sources.read` with
  * `streaming=true`). A scheduled pipeline whose frame is streaming
  * runs as an INCREMENTAL BATCH: `Trigger.AvailableNow` drains
  * everything the source has accumulated since the checkpoint's last
  * offsets, then the query stops — so each scheduler tick processes
  * only new files, the run is bounded (the reference's run_task
  * contract: start, finish, history row — core/engine.py:35-96), and a
  * crash mid-run resumes from the checkpoint on the next tick with
  * exactly-once file-source semantics.
  *
  * Modes:
  *  - `append`: plain file-format streaming sink (parquet/csv/json/orc).
  *  - `upsert`: CDC merge by key/version into a bucketed parquet
  *    snapshot — [[StreamOps.upsertToParquetBucketed]] (rename-swap;
  *    HDFS/local) or, with option `commit=manifest`,
  *    [[StreamOps.upsertToParquetManifest]] (write-once manifests;
  *    object stores). Options: `keyCol`, `versionCol`, `numBuckets`.
  *
  * `checkpointLocation` is required and resolves against the
  * connection's basePath unless absolute — the checkpoint must live
  * with the target's storage so a restart anywhere in the cluster
  * finds the same offsets. A STEP-level checkpointLocation is used
  * as-is; a CONNECTION-level one is a shared base and is NAMESPACED
  * by the step name — otherwise every streaming load on that
  * connection would silently reuse the first load's committed offsets
  * and drain nothing (no error, just missing data).
  *
  * Upgrade path: deployments from before the namespacing committed
  * offsets at the connection-level path ITSELF. Renaming those out
  * from under a running deployment would abandon the offsets — the
  * stream reprocesses every source file from scratch and an append
  * sink gets every historical row a second time. So when the step is
  * the connection's ONLY checkpoint-less streaming load AND the
  * legacy un-namespaced path already holds a committed checkpoint
  * (an `offsets/` dir or `metadata` file), the legacy path is kept.
  * With two or more loads sharing the connection the namespaced path
  * always wins: the legacy layout was silently wrong for them anyway.
  */
object StreamingLoad {

  private def resolve(base: Option[String], p: String): String =
    if (p.startsWith("/") || p.contains("://")) p
    else base.map(b => s"$b/$p").getOrElse(p)

  /** Checkpoint resolution (see class doc; unit-tested directly):
    * step-level value wins verbatim, connection-level value gets
    * `/<step.name>` appended so distinct steps never collide —
    * except the sole-load legacy adoption described in the class doc,
    * probed via `legacyHasCheckpoint` (injected so tests need no FS). */
  private[streaming] def resolveCheckpoint(
      conn: ConnectionSpec, step: LoadStep,
      soleConnectionLoad: Boolean = false,
      legacyHasCheckpoint: String => Boolean = _ => false): String = {
    val base = conn.options.get("basePath").orElse(conn.options.get("baseDir"))
    step.options.get("checkpointLocation") match {
      case Some(p) => resolve(base, p)
      case None =>
        val shared = conn.options.getOrElse("checkpointLocation",
          throw new IllegalArgumentException(
            s"load '${step.name}': streaming load needs option checkpointLocation"))
        val legacy = resolve(base, shared)
        if (soleConnectionLoad && legacyHasCheckpoint(legacy)) legacy
        else s"$legacy/${step.name}"
    }
  }

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksdbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val hdfsProvider =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  /** State-store provider for a streaming load's run.
    *
    * HDFS-backed state lives in executor heap — at deployment scale
    * (dedup keys, join buffers over days of traffic) that caps state at
    * memory and OOMs first; RocksDB spills to local disk and is the
    * provider a 100 TB pipeline runs. But the provider is part of a
    * checkpoint's on-disk state format, so it must never flip across a
    * restart — Spark itself records providerClass in the offsets-log
    * metadata and replays it when resuming. Resolution: an explicit
    * `stateStore` option (`rocksdb` | `hdfs`) always wins; otherwise a
    * FRESH checkpoint (no committed offsets yet) defaults to RocksDB,
    * and an existing one sets nothing — the checkpoint's own recorded
    * conf governs the restart.
    */
  private[streaming] def resolveStateStore(
      merged: Map[String, String], checkpointExists: Boolean): Option[String] =
    merged.get("stateStore") match {
      case Some("rocksdb") => Some(rocksdbProvider)
      case Some("hdfs") => Some(hdfsProvider)
      case Some(other) => throw new IllegalArgumentException(
        s"stateStore must be rocksdb | hdfs, got '$other'")
      case None => if (checkpointExists) None else Some(rocksdbProvider)
    }

  /** True when `path` holds a Structured Streaming checkpoint (its
    * committed-offsets dir or metadata marker exists). */
  private def hasCommittedCheckpoint(
      spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val fs = graft.connect.Hfs.fs(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    graft.connect.Hfs.isDir(fs, new org.apache.hadoop.fs.Path(p, "offsets")) ||
      graft.connect.Hfs.isFile(fs, new org.apache.hadoop.fs.Path(p, "metadata"))
  }

  def write(df: DataFrame, conn: ConnectionSpec, step: LoadStep,
      soleConnectionLoad: Boolean = true): Unit = {
    require(df.isStreaming, s"load '${step.name}': StreamingLoad needs a streaming frame")
    val merged = conn.options ++ step.options
    val base = conn.options.get("basePath").orElse(conn.options.get("baseDir"))
    val path = step.path.orElse(step.table).getOrElse(
      throw new IllegalArgumentException(s"load '${step.name}': path required"))
    val full = resolve(base, path)
    val checkpoint = resolveCheckpoint(conn, step, soleConnectionLoad,
      legacy => hasCommittedCheckpoint(df.sparkSession, legacy))
    val provider = resolveStateStore(merged,
      hasCommittedCheckpoint(df.sparkSession, checkpoint))
    def req(k: String): String = merged.getOrElse(k,
      throw new IllegalArgumentException(s"load '${step.name}': upsert needs option $k"))
    val writer = step.mode match {
      case "upsert" =>
        val nb = merged.getOrElse("numBuckets", "16").toInt
        if (merged.get("commit").contains("manifest"))
          StreamOps.upsertToParquetManifest(df, req("keyCol"), req("versionCol"), full, nb)
        else
          StreamOps.upsertToParquetBucketed(df, req("keyCol"), req("versionCol"), full, nb)
      case "append" if merged.contains("annIndex") =>
        // streaming ANN-index maintenance: each drained micro-batch is
        // encoded against the frozen artifacts (pcaModel → rotated
        // space) and appended to the index layout. Encoding is a pure
        // per-row map, so append ≡ rebuild and arrival order never
        // changes the index contents; crash-and-retry semantics are
        // AT-LEAST-ONCE like the shard sink (a replayed batch appends
        // its rows again — dedup by vec_id at probe time or rebuild).
        val kind = merged("annIndex")
        require(kind == "prefix" || kind == "ivfpq",
          s"load '${step.name}': unknown annIndex kind '$kind' (supported: prefix, ivfpq)")
        require(conn.format == "parquet",
          s"load '${step.name}': annIndex layout requires parquet, got '${conn.format}'")
        val dims = merged.get("dims").map(_.toInt)
        // the PCA model is loaded ONCE (plain data,
        // session-independent); the index columns must build against
        // the MICRO-BATCH's session — streaming runs batches on a
        // cloned session, and a function registered only on the outer
        // session after the clone was taken does not resolve there
        val model = merged.get("pcaModel")
          .map(mp => graft.ops.Similarity.loadPcaModel(df.sparkSession, mp))
        // the IvfPq model is DATAFRAMES (codebooks), so unlike the
        // plain-data PCA model it must be loaded against the
        // micro-batch's own session inside the loop (two KB-sized
        // parquet reads per tick); only the path is validated up front
        val ivfModelPath =
          if (kind != "ivfpq") None
          else Some(merged.getOrElse("ivfpqModel",
            throw new IllegalArgumentException(
              s"load '${step.name}': annIndex=ivfpq requires option " +
                "'ivfpqModel' (frozen model path — train offline)")))
        // optional "semanticDecontaminateIndex": EMBEDDING-space
        // decontamination per tick — the third member of the streaming
        // decontamination trio (exact n-gram overlap and lexical BM25
        // live on the shard route, where TEXT streams; the semantic
        // route lives HERE, on the embedding route, because paraphrased
        // test leakage is only visible in representation space). Each
        // drained micro-batch drops every row within cosine
        // "semanticDecontaminateTau"/1000 of ANY vector in the frozen
        // benchmark set at the given path BEFORE encoding and appending
        // (Similarity.semanticDecontaminate: exact full-dim cosine, the
        // bench side broadcast under its maxBenchRows guard — a
        // decontamination pass must not have false negatives within its
        // threshold). Corpus = the tick, so per-tick cost is
        // batch-sized by construction, and because the drop is a pure
        // per-row predicate against a FROZEN set, stream ≡ batch: the
        // accumulated index equals an offline decontaminate-then-build
        // whatever the tick boundaries (spec-pinned). Default τ = 950‰,
        // the q_emb_decontam gate row's threshold.
        val semBench = merged.get("semanticDecontaminateIndex").map(resolve(base, _))
        val semTau = merged.get("semanticDecontaminateTau").map(_.toLong).getOrElse(950L)
        // optional "semanticDedupIndex": arrival-order SEMANTIC dedup
        // admission per tick — the embedding sibling of the shard
        // route's exactDedupIndex. Each drained micro-batch is admitted
        // against (and into) a createSemanticDedupIndex layout BEFORE
        // the ANN-index append: within the tick, SemDeDup's pair rule
        // under the index's frozen codebook; across ticks, any vector
        // within cosine τ of an already-admitted one is rejected.
        // Replay after a crash is idempotent per batch id (the batch's
        // own generation is replaced, never self-rejected); schedule
        // compact_semantic_dedup_index between drains to fold
        // generations. Order per tick: decontaminate (drop benchmark
        // leakage first — a leaked vector must never become the
        // admitted representative that rejects clean arrivals), then
        // admit, then append.
        val semDedupIdx = merged.get("semanticDedupIndex").map(resolve(base, _))
        df.writeStream.foreachBatch { (b0: DataFrame, bid: Long) =>
          graft.CacheScope.scoped {
          val bs = b0.sparkSession
          val cleaned = semBench match {
            case Some(p) => graft.ops.Similarity.semanticDecontaminate(
              bs, b0, bs.read.parquet(p), semTau)
            case None => b0
          }
          val b = semDedupIdx match {
            case Some(p) => graft.ops.Similarity.admitSemanticDedup(cleaned, p, bid)
            case None => cleaned
          }
          ivfModelPath match {
            case Some(mp) =>
              val im = graft.ops.Similarity.loadIvfPqModel(bs, mp)
              // first tick creates the layout (GROUPED by default —
              // explicit listsPerDir or the k-adaptive default;
              // indexLayout=flat for the legacy layout), later ticks
              // self-route off the layout marker — maintainIvfPqIndex
              // fails loudly on a width/layout conflict
              graft.ops.Similarity.maintainIvfPqIndex(
                graft.ops.Similarity.indexIvfPq(bs, b, im), full,
                merged.get("listsPerDir").map(_.toInt),
                flat = merged.get("indexLayout").contains("flat"),
                // width from the MODEL's list count, not the tick's
                // max centroid: a small first tick under a large-k
                // model would otherwise freeze a too-narrow width
                // (by-name — counted only when the layout is created)
                nLists = Some(im.coarse.count()))
            case None =>
              val idx = model match {
                case Some(m) => graft.ops.Similarity.buildRotatedPrefixIndex(
                  bs, b, m, dims.getOrElse(m.k))
                case None => graft.ops.Similarity.buildPrefixIndex(
                  bs, b, dims.getOrElse(graft.ops.Similarity.prefixDims))
              }
              graft.ops.Similarity.appendPrefixIndex(idx, full)
          }
          // The load owns the tick's terminal action; the scoped block
          // around this tick drains ITS OWN persisted intermediates on
          // exit (CacheScope contract — without it a long-running
          // scheduled stream accumulates strong Dataset refs +
          // MEMORY_AND_DISK blocks across ticks). Per-tick scoping,
          // not a global drain: drain() would also unpersist the live
          // intermediates of any OTHER pipeline ticking concurrently
          // in this JVM — correctness-safe but recompute thrash.
          }
          ()
        }.outputMode("append")
      case "append" if merged.contains("bm25Index") =>
        // streaming BM25-index maintenance: each drained micro-batch is
        // appended to the inverted-index layout as its own generation
        // (TextAnalysis.maintainBm25Index — the annIndex sibling for
        // the retrieval family). All index statistics are additive, so
        // append ≡ rebuild holds EXACTLY whatever the arrival order;
        // crash-and-retry is IDEMPOTENT PER BATCH ID (the batch's own
        // generation is replaced, never double-counted). Schedule
        // compact_bm25_index between drains to fold generations.
        require(conn.format == "parquet",
          s"load '${step.name}': bm25Index layout requires parquet, got '${conn.format}'")
        val buckets = merged.get("bm25Buckets").map(_.toInt)
        df.writeStream.foreachBatch { (b: DataFrame, bid: Long) =>
          // per-tick scope, not a global drain (see the annIndex case)
          graft.CacheScope.scoped {
            graft.ops.TextAnalysis.maintainBm25Index(b, full, bid, buckets)
          }
          ()
        }.outputMode("append")
      case "append" if merged.contains("shardBy") || merged.contains("shards") =>
        // streaming curation endpoint: each drained micro-batch extends
        // the deterministic training-shard layout additively
        // (Sharding.appendToShards — placement is a pure function, so
        // arrival order never changes membership). Semantics across a
        // crash-and-retry are AT-LEAST-ONCE (a replayed batch appends
        // again, like any non-idempotent foreachBatch sink); use the
        // manifest-committed upsert mode when exactly-once matters.
        val key = merged.getOrElse("shardBy", throw new IllegalArgumentException(
          s"load '${step.name}': shardBy and shards must be set together"))
        val n = merged.getOrElse("shards", throw new IllegalArgumentException(
          s"load '${step.name}': shardBy and shards must be set together")).toInt
        require(conn.format == "parquet",
          s"load '${step.name}': shard layout requires parquet, got '${conn.format}'")
        // optional "exactDedupIndex": admit each micro-batch against
        // (and into) an exact-dedup prefix index BEFORE sharding —
        // "dedup documents as they arrive" with the PPJoin
        // no-false-negatives guarantee (Dedup.admitExactDedup); the
        // index path resolves against the connection like the target
        val dedupIdx = merged.get("exactDedupIndex").map(resolve(base, _))
        // optional "exactDecontaminateIndex": run the frozen-index
        // decontamination SHUFFLE path (Dedup.exactDecontaminateFrozen)
        // on each drained micro-batch — the over-ceiling route for
        // benches too large for the per-row broadcast serve
        // (exactDecontaminateServe's maxBenchShingles guard). Inside
        // foreachBatch the frame is a plain batch DataFrame, so the
        // candidate join + exact verify run per tick with no state and
        // no broadcast ceiling; "exactDecontaminateTau" raises the
        // serving threshold above the built one (lowering errors).
        val deconIdx = merged.get("exactDecontaminateIndex").map(resolve(base, _))
        val deconTau = merged.get("exactDecontaminateTau").map(_.toLong)
        // optional "bm25DecontaminateIndex": LEXICAL decontamination per
        // tick — score each drained micro-batch against the frozen
        // benchmark targets at the given path (corpus = the tick, so
        // per-tick cost is batch-sized by construction) and anti-join
        // the docs that land in some target's BM25 top-k. Catches
        // lexically-close rephrasings the exact n-gram routes are blind
        // to; pair with exactDecontaminateIndex for guaranteed overlap
        // coverage. NOTE top-k is per TICK here: a near-copy that ranks
        // below k within one tick survives (smaller ticks = stricter),
        // which is the price of scoring incrementally — the batch
        // bm25_decontaminate transform ranks against the full corpus.
        val bm25Bench = merged.get("bm25DecontaminateIndex").map(resolve(base, _))
        val bm25K = merged.get("bm25DecontaminateK").map(_.toInt).getOrElse(20)
        val bm25Toks = merged.get("bm25DecontaminateTokens").map(_.toInt).getOrElse(8)
        // optional "semanticDecontaminateIndex"/"semanticDedupIndex":
        // the EMBEDDING-space twins of the lexical/exact options above,
        // for shard loads whose rows carry (vec_id, embedding) next to
        // (doc_id, text) — a curation endpoint can then compose ALL the
        // routes in one drained tick. Order per tick is decontaminate →
        // admit → append, decontamination lenses first (exact n-gram,
        // lexical BM25, semantic cosine — each catches leaks the others
        // provably miss), THEN admission (exact, then semantic): a
        // leaked doc must never become the admitted representative that
        // rejects clean arrivals (StreamingPipelineSpec pins the
        // composed lifecycle against an offline composition).
        val semBench2 = merged.get("semanticDecontaminateIndex").map(resolve(base, _))
        val semTau2 = merged.get("semanticDecontaminateTau").map(_.toLong).getOrElse(950L)
        val semDedupIdx2 = merged.get("semanticDedupIndex").map(resolve(base, _))
        df.writeStream.foreachBatch { (b: DataFrame, bid: Long) =>
          graft.CacheScope.scoped {
          val lexCleaned = bm25Bench match {
            case Some(p) =>
              // bench read against the micro-batch's session
              // (cloned-session rule); serving-batch size is guarded
              // loudly inside bm25RanksOn
              val hits = graft.ops.TextAnalysis
                .bm25TopKOn(b, b.sparkSession.read.parquet(p), bm25K, bm25Toks)
                .select(org.apache.spark.sql.functions.col("doc_id")).distinct()
              b.join(hits, Seq("doc_id"), "left_anti")
            case None => b
          }
          val exCleaned = deconIdx match {
            case Some(p) => graft.ops.Dedup.exactDecontaminateFrozen(lexCleaned, p, deconTau)
            case None => lexCleaned
          }
          val cleaned = semBench2 match {
            case Some(p) => graft.ops.Similarity.semanticDecontaminate(
              b.sparkSession, exCleaned, b.sparkSession.read.parquet(p), semTau2)
            case None => exCleaned
          }
          // the batch id makes the index append idempotent per batch:
          // a replay after a partial failure recomputes the same
          // admitted set instead of self-rejecting against its own
          // orphaned index rows (which would silently drop those docs)
          val exAdmitted = dedupIdx match {
            case Some(p) => graft.ops.Dedup.admitExactDedup(cleaned, p, bid)
            case None => cleaned
          }
          val admitted = semDedupIdx2 match {
            case Some(p) => graft.ops.Similarity.admitSemanticDedup(exAdmitted, p, bid)
            case None => exAdmitted
          }
          graft.ops.Sharding.appendToShards(admitted, key, full, n)
          // per-tick scope, not a global drain (see the annIndex case)
          }
          ()
        }.outputMode("append")
      case "append" =>
        df.writeStream.format(conn.format).option("path", full).outputMode("append")
      case other => throw new IllegalArgumentException(
        s"load '${step.name}': streaming load supports append | upsert, got '$other'")
    }
    // the provider conf is captured at query start; scope the override
    // to this run and restore the session's setting afterwards
    val session = df.sparkSession
    val prevProvider = session.conf.getOption(providerKey)
    provider.foreach(session.conf.set(providerKey, _))
    try {
      val q = writer
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally if (q.isActive) q.stop()
    } finally if (provider.isDefined) prevProvider match {
      case Some(v) => session.conf.set(providerKey, v)
      case None => session.conf.unset(providerKey)
    }
  }
}
