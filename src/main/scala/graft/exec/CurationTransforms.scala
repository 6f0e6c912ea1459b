package graft.exec

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registers the LLM-curation operators as NAMED pipeline transforms,
  * so the full decontaminate → select → shard chain is expressible in
  * the reference-shaped declarative surface (A10 named dispatch, A11
  * history fold) — a JSON `PipelineSpec` instead of hand-chained
  * library calls. The shard write is the matching declarative LOAD
  * step (`shardBy`/`shards` options, `connect.Sources.write`).
  *
  * Registration closes over the configuration (benchmark path, sizing)
  * because the transform registry is deliberately name → function with
  * no parameter channel: extension = registered Scala code, never an
  * eval of config strings (the registry's contract, PipelineRunner).
  */
object CurationTransforms {

  /** Register `bloom_decontaminate`: drop every corpus document whose
    * shingles might overlap the benchmark at `benchPath` (no false
    * negatives; fp sizing per [[Dedup.benchmarkBloom]]'s knobs). The
    * filter is built ONCE at first use per run and broadcast — the
    * corpus is never shuffled on content.
    */
  def registerBloomDecontaminate(
      registry: TransformRegistry,
      spark: SparkSession,
      benchPath: String,
      estItems: Option[Long] = None,
      numBits: Option[Long] = None): Unit = {
    // the filter is built lazily on FIRST use and memoized for the
    // registration's lifetime — a pipeline applying the transform
    // twice (or per micro-batch inside foreachBatch) pays the
    // benchmark read + bloom fold once
    lazy val bloom: Array[Byte] = {
      val bench = spark.read.parquet(benchPath)
      (estItems, numBits) match {
        case (Some(e), Some(b)) => Dedup.benchmarkBloom(bench, e, b)
        case (Some(e), None) => Dedup.benchmarkBloom(bench, estItems = e)
        case (None, Some(b)) => Dedup.benchmarkBloom(bench, numBits = b)
        case _ => Dedup.benchmarkBloom(bench)
      }
    }
    registry.register("bloom_decontaminate", { corpus: DataFrame =>
      Dedup.bloomClean(corpus, bloom)
    })
  }

  /** Register `bm25_select`: retrieval-GUIDED data selection — keep
    * exactly the corpus documents that appear in some target query's
    * BM25 top-`k` (targets read from `benchPath`, each contributing
    * its first `queryTokens` distinct tokens as a query). The inverse
    * of decontamination: instead of dropping what matches a benchmark,
    * keep what matches a TARGET DOMAIN — the lexical sibling of DSIR
    * selection, and the standard recipe for carving a domain-relevant
    * pretraining subset out of a web-scale corpus. Scoring is
    * [[graft.ops.TextAnalysis.bm25TopKOn]] (map-side-pruned postings,
    * exact fixed-point arithmetic); the keep is a left-semi join on
    * doc_id. Targets are read lazily at first use; their query
    * vocabulary is counted there and fails loudly above the
    * serving-batch broadcast ceiling
    * ([[graft.ops.TextAnalysis.maxBm25QueryTerms]]).
    */
  def registerBm25Select(
      registry: TransformRegistry,
      spark: SparkSession,
      benchPath: String,
      k: Int = 20,
      queryTokens: Int = 8): Unit = {
    lazy val targets = spark.read.parquet(benchPath)
    registry.register("bm25_select", { corpus: DataFrame =>
      val hits = graft.ops.TextAnalysis.bm25TopKOn(corpus, targets, k, queryTokens)
        .select(col("doc_id")).distinct()
      corpus.join(hits, Seq("doc_id"), "left_semi")
    })
  }

  /** Register `bm25_decontaminate`: the inverse verb of
    * [[registerBm25Select]] — DROP every corpus document that appears
    * in some benchmark query's BM25 top-`k` (anti join instead of
    * semi). Complements the exact-overlap routes (`bloom_decontaminate`,
    * `exact_decontaminate`): those guarantee no missed n-gram overlap;
    * this one catches lexically-close rephrasings those are blind to,
    * at the cost of dropping top-k near matches that may be clean —
    * the standard belt-and-suspenders pairing for eval-set hygiene.
    *
    * RECALL LIMITS — read before relying on this as the only gate:
    * each benchmark doc contributes only its first `queryTokens`
    * (default 8) distinct tokens as the query, so contamination that
    * only appears PAST that prefix never matches (raise `queryTokens`
    * when the benchmark's identifying text sits deep in the doc); and
    * with the default top-`k` cut, a corpus holding more than `k`
    * near-copies of one benchmark doc keeps the overflow. For the
    * unbounded form pass `minScore6`: every doc scoring ≥
    * `minScore6`/1e6 against ANY benchmark query is dropped — no
    * per-query cap, at the cost of tuning an absolute threshold
    * (calibrate on a held-out slice; the score scale is the
    * [[graft.ops.TextAnalysis.bm25RanksOn]] odds-ratio arithmetic).
    * For GUARANTEED n-gram coverage, pair with `exact_decontaminate` —
    * this transform is the rephrasing net, not the exactness one.
    */
  def registerBm25Decontaminate(
      registry: TransformRegistry,
      spark: SparkSession,
      benchPath: String,
      k: Int = 20,
      queryTokens: Int = 8,
      minScore6: Option[Long] = None): Unit = {
    lazy val targets = spark.read.parquet(benchPath)
    registry.register("bm25_decontaminate", { corpus: DataFrame =>
      val hits = (minScore6 match {
        case Some(t) =>
          graft.ops.TextAnalysis.bm25RanksOn(corpus, targets, queryTokens)
            .filter(col("s6") >= t)
        case None =>
          graft.ops.TextAnalysis.bm25TopKOn(corpus, targets, k, queryTokens)
      }).select(col("doc_id")).distinct()
      corpus.join(hits, Seq("doc_id"), "left_anti")
    })
  }

  /** Register `hybrid_select`: the two-tower form of
    * [[registerBm25Select]] — keep exactly the corpus documents that
    * appear in some target's FUSED top-`k` under BM25 + embedding-
    * cosine reciprocal-rank fusion
    * ([[graft.ops.TextAnalysis.hybridTopKOn]]): the sparse list
    * catches exact token overlap that embeddings smooth away, the
    * dense list catches paraphrase the lexicon misses, and RRF fuses
    * ranks only. The in-flight frame and the targets at `benchPath`
    * must both carry (doc_id, text, embedding). Targets are read
    * lazily at first use against the IN-FLIGHT frame's session
    * (cloned-session rule) and are size-guarded like every serving
    * batch here.
    */
  def registerHybridSelect(
      registry: TransformRegistry,
      benchPath: String,
      k: Int = 20,
      queryTokens: Int = 8,
      perSide: Int = 20): Unit =
    registry.register("hybrid_select", { corpus: DataFrame =>
      val targets = corpus.sparkSession.read.parquet(benchPath)
      val hits = graft.ops.TextAnalysis
        .hybridTopKOn(corpus, targets, k, queryTokens, perSide)
        .select(col("doc_id")).distinct()
      corpus.join(hits, Seq("doc_id"), "left_semi")
    })

  /** Register `classifier_filter`: the CCNet/GPT-3-shaped quality
    * gate — TRAIN the batch-perceptron classifier on the in-flight
    * corpus (curated-vs-crawl labels from `posSources`) and keep the
    * documents the trained model scores above `minMargin`. Training is
    * the [[graft.ops.TextAnalysis.perceptronMarginsOn]] distributed
    * loop (≤257-row model, integer-exact); the filter is a left-semi
    * join of the corpus against the passing doc ids.
    */
  def registerClassifierFilter(
      registry: TransformRegistry,
      spark: SparkSession,
      posSources: Seq[String],
      rounds: Int = 3,
      minMargin: Long = 0L): Unit =
    registry.register("classifier_filter", { corpus: DataFrame =>
      val (_, margins) =
        graft.ops.TextAnalysis.perceptronMarginsOn(spark, corpus, posSources, rounds)
      corpus.join(
        margins.filter(col("m") > minMargin).select(col("doc_id")),
        Seq("doc_id"), "left_semi")
    })

  /** Register `model_filter`: the frozen-model sibling of
    * `classifier_filter` — load a [[graft.ops.TextAnalysis.QualityModel]]
    * trained offline (and saved with `saveQualityModel`) and keep
    * documents it scores above `minMargin`. Scoring is the stateless
    * per-row fold ([[graft.ops.TextAnalysis.scoreDocs]]): no join, no
    * shuffle — works unchanged on streaming extracts too.
    */
  def registerModelFilter(
      registry: TransformRegistry,
      spark: SparkSession,
      modelPath: String,
      minMargin: Long = 0L): Unit =
    registry.register("model_filter", { corpus: DataFrame =>
      val model = graft.ops.TextAnalysis.loadQualityModel(spark, modelPath)
      graft.ops.TextAnalysis.scoreDocs(corpus, model)
        .filter(col("margin") > minMargin)
        .drop("margin")
    })

  /** Register `model_quantile_filter`: the distribution-RELATIVE form
    * of `model_filter` — score the in-flight corpus with a FROZEN
    * quality model and keep the ties-inclusive top `keepPermille`‰ BY
    * MARGIN (the FineWeb recipe: the classifier ranks, the corpus
    * quantile decides the cut, so the kept fraction is stable across
    * corpora while a fixed `minMargin` is not). Margins are unbounded
    * integers, so unlike the permille-grid score the histogram
    * cardinality is data-dependent; `granularity` buckets margins by
    * truncating division (monotone, so the cut stays a pure
    * threshold on margin) to bound the rollup — g = 1 is exact, a
    * deployment sets g from the observed margin range the way the
    * binned token budget sizes its bins. Model loaded lazily,
    * memoized; original columns pass through.
    */
  def registerModelQuantileFilter(
      registry: TransformRegistry,
      spark: SparkSession,
      modelPath: String,
      keepPermille: Long,
      granularity: Long = 1L): Unit = {
    require(granularity >= 1L, s"granularity must be >= 1, got $granularity")
    lazy val model = graft.ops.TextAnalysis.loadQualityModel(spark, modelPath)
    registry.register("model_quantile_filter", { corpus: DataFrame =>
      val scored = graft.ops.TextAnalysis.scoreDocs(corpus, model)
        .withColumn("__mq_b", expr(s"margin div $granularity"))
      graft.ops.TextAnalysis.quantileFilterOn(scored, "__mq_b", keepPermille)
        .drop("margin", "__mq_b")
        .select(corpus.columns.map(col).toSeq: _*)
    })
  }

  /** Register `bpe_token_stats`: annotate every document with
    * word/token/char counts under a FROZEN tokenizer model (trained
    * with [[graft.ops.TextAnalysis.trainBpeModel]], saved with
    * `saveBpeModel`) — the token-budget accounting step of a curation
    * chain, served statelessly
    * ([[graft.ops.TextAnalysis.bpeServeDocs]]: one higher-order fold,
    * no explode, no vocab join, no shuffle — identical on batch and
    * streaming extracts, and OOV words are encoded by the merge rules
    * instead of dropped).
    */
  def registerBpeTokenStats(
      registry: TransformRegistry,
      spark: SparkSession,
      modelPath: String): Unit =
    registry.register("bpe_token_stats", { docs: DataFrame =>
      val model = graft.ops.TextAnalysis.loadBpeModel(spark, modelPath)
      graft.ops.TextAnalysis.bpeServeDocs(docs, model)
    })

  /** Register `pca_project`: annotate every embedding row with its
    * exact integer projections `pca_proj1..k` onto a FROZEN PCA basis
    * (trained with [[graft.ops.Similarity.trainPcaModel]], saved with
    * `savePcaModel`) — the whitening/drift-monitor step of an
    * embedding-curation chain, served statelessly
    * ([[graft.ops.Similarity.pcaServeOn]]: literal-array folds, no
    * join, no shuffle, no streaming state — identical on batch and
    * streaming extracts). The model is loaded lazily on first use and
    * memoized for the registration's lifetime, like the bloom filter.
    */
  def registerPcaProject(
      registry: TransformRegistry,
      spark: SparkSession,
      modelPath: String): Unit = {
    lazy val model = graft.ops.Similarity.loadPcaModel(spark, modelPath)
    registry.register("pca_project", { frame: DataFrame =>
      graft.ops.Similarity.pcaServeOn(frame, model)
    })
  }

  /** Register `semantic_decontaminate`: drop every embedding row of
    * the in-flight frame within cosine `tauMilli/1000` of ANY vector
    * in the benchmark set at `benchPath` — the embedding-space sibling
    * of `bloom_decontaminate` (paraphrased test leakage that n-gram
    * overlap misses). Exact full-dim comparison, bench side broadcast:
    * no false negatives within the threshold, corpus never shuffles on
    * content ([[graft.ops.Similarity.semanticDecontaminate]]). The
    * bench frame is read against the IN-FLIGHT frame's session so the
    * transform works inside foreachBatch (cloned-session rule).
    */
  def registerSemanticDecontaminate(
      registry: TransformRegistry,
      benchPath: String,
      tauMilli: Long): Unit =
    registry.register("semantic_decontaminate", { corpus: DataFrame =>
      val s = corpus.sparkSession
      graft.ops.Similarity.semanticDecontaminate(
        s, corpus, s.read.parquet(benchPath), tauMilli)
    })

  /** Register `exact_decontaminate`: drop every doc of the in-flight
    * frame whose shingle set τ-CONTAINS any benchmark doc at
    * `benchPath` ([[graft.ops.Dedup.exactDecontaminate]]) — the exact
    * n-gram pass of the decontamination trio (bloom = approximate
    * membership, semantic = paraphrase, this = exact quotation, which
    * Jaccard misses when the quote sits inside a much larger doc).
    * Bench read against the in-flight frame's session (cloned-session
    * rule); only the bench side prefixes, so per-tick cost is
    * bench-prefix × corpus-df bounded.
    */
  def registerExactDecontaminate(
      registry: TransformRegistry,
      benchPath: String,
      tauMilli: Long): Unit =
    registry.register("exact_decontaminate", { corpus: DataFrame =>
      graft.ops.Dedup.exactDecontaminate(
        corpus, corpus.sparkSession.read.parquet(benchPath), tauMilli)
    })

  /** Register `exact_decontaminate` served from a FROZEN bench-prefix
    * index ([[graft.ops.Dedup.saveBenchPrefixIndex]]) — same transform
    * name, so a chain's JSON is unchanged when the pipeline graduates
    * from recomputing bench prefixes per run to the frozen artifact
    * (the same swap every other trained model here supports). Per-tick
    * cost drops to the corpus shingle scan + candidate-pruned verify;
    * the index parquet is read against the in-flight frame's session
    * (cloned-session rule), so the registration works inside
    * foreachBatch. `tauMilli=None` serves at the artifact's built tau;
    * a HIGHER serving tau is sound (prefix superset), a lower one
    * errors loudly at load.
    *
    * Routing: a BATCH frame takes the shuffle path
    * ([[graft.ops.Dedup.exactDecontaminateFrozen]] — scales to any
    * bench size); a STREAMING frame takes the stateless per-row
    * broadcast path ([[graft.ops.Dedup.exactDecontaminateServe]] —
    * aggregation-free, so it runs inside a tick; size-guarded loudly).
    * Both paths verify exactly, so the route never changes the result.
    */
  def registerExactDecontaminateFrozen(
      registry: TransformRegistry,
      indexPath: String,
      tauMilli: Option[Long] = None): Unit =
    registry.register("exact_decontaminate", { corpus: DataFrame =>
      if (corpus.isStreaming)
        graft.ops.Dedup.exactDecontaminateServe(corpus, indexPath, tauMilli)
      else
        graft.ops.Dedup.exactDecontaminateFrozen(corpus, indexPath, tauMilli)
    })

  /** Register `ann_neighbors`: annotate every embedding row of the
    * in-flight frame with its top-k nearest corpus neighbors served
    * from a FROZEN prefix index (`graft.ops.Similarity`
    * buildPrefixIndex / buildRotatedPrefixIndex layouts; pass
    * `pcaModelPath` iff the index was built rotated) — the
    * consumption half of the declarative ANN story (the `annIndex`
    * load step is the maintenance half). Neighbors arrive as a
    * rank-ordered comma-joined id string in `ann_neighbors` (string,
    * not array: annotation columns must stay hashable downstream);
    * rows without neighbors keep an empty string. The frame is the
    * QUERY side in its own id space, so self-matches are NOT excluded
    * — identical ids on both sides mean the corpus row is a true
    * (distance-0) neighbor, exactly what dedup-shaped consumers want.
    */
  def registerAnnNeighbors(
      registry: TransformRegistry,
      spark: SparkSession,
      corpusPath: String,
      indexPath: String,
      pcaModelPath: Option[String] = None,
      dims: Option[Int] = None,
      shortlist: Int = 64,
      k: Int = 3): Unit = {
    import graft.ops.Similarity
    // the PCA model is plain data (a few ≤64-element arrays) — safe to
    // memoize across batches; the corpus/index FRAMES are read against
    // the in-flight frame's session below (cloned-session rule: inside
    // foreachBatch the micro-batch analyzes against a clone, and
    // outer-session plans must not mix into it — the
    // registerSemanticDecontaminate discipline)
    lazy val model = pcaModelPath.map(Similarity.loadPcaModel(spark, _))
    registry.register("ann_neighbors", { frame: DataFrame =>
      val s = frame.sparkSession
      val corpus = s.read.parquet(corpusPath)
      val index = s.read.parquet(indexPath)
      val probed = model match {
        case Some(m) => Similarity.probeRotatedPrefixIndex(
          s, corpus, frame, m, index, dims.getOrElse(m.k), shortlist, k,
          excludeSelf = false)
        case None => Similarity.probePrefixIndex(
          s, corpus, frame, index, dims.getOrElse(Similarity.prefixDims),
          shortlist, k, excludeSelf = false)
      }
      val byQuery = probed
        .groupBy(col("qid").as("vec_id"))
        .agg(concat_ws(",", transform(
          array_sort(collect_list(struct(col("rank"), col("cid")))),
          p => p("cid").cast("string"))).as("ann_neighbors"))
      frame.join(byQuery, Seq("vec_id"), "left")
        .withColumn("ann_neighbors", coalesce(col("ann_neighbors"), lit("")))
    })
  }

  /** Register `entropy_filter`: keep documents whose word-distribution
    * entropy clears `minNats10` tenths of a nat (the
    * [[graft.ops.TextAnalysis.wordEntropy]] signal as a gate —
    * concentrated-vocabulary boilerplate drops). The test is the exact
    * integer cross-multiply nh·10 ≥ minNats10·1e6·n; the filter is a
    * left-semi join against the passing doc ids.
    */
  def registerEntropyFilter(
      registry: TransformRegistry, minNats10: Long): Unit =
    registry.register("entropy_filter", { docs: DataFrame =>
      val pass = graft.ops.TextAnalysis.docEntropy(docs)
        .filter(col("nh") * 10L >= lit(minNats10 * 1000000L) * col("n"))
        .select(col("doc_id"))
      docs.join(pass, Seq("doc_id"), "left_semi")
    })

  /** Register `quality_filter`: keep documents whose type-token-ratio
    * clears `minTtrPermille` — the same integer permille-grid quality
    * score the token-budget selectors rank by, as a standalone
    * declarative gate (map-side only: no shuffle, no window).
    */
  def registerQualityFilter(
      registry: TransformRegistry, minTtrPermille: Long): Unit =
    registry.register("quality_filter", { docs: DataFrame =>
      docs.filter(expr(
        s"${graft.ops.TextAnalysis.ttrPermilleSql("text")} >= $minTtrPermille"))
    })

  /** Register `dedup_filter`: near-duplicate removal as a declarative
    * stage — the most-run curation step of all, previously
    * library/catalog-only. Resolves MinHash-LSH families on the
    * in-flight frame and keeps one doc per family (min-id canonical,
    * or the longest copy with `keepBest = true`). Original columns
    * pass through unchanged.
    */
  def registerDedupFilter(
      registry: TransformRegistry, keepBest: Boolean = false): Unit =
    registry.register("dedup_filter", { docs: DataFrame =>
      graft.ops.Dedup.nearDupFilterOn(docs, keepBest)
    })

  /** Register `exact_dedup_filter`: the EXACT (PPJoin prefix-join)
    * near-dup stage — same keep semantics as `dedup_filter` but with a
    * no-false-negatives guarantee ([[graft.ops.Dedup.exactDedupFilterOn]]):
    * every pair with Jaccard ≥ `tauMilli/1000` is found and collapsed,
    * where the MinHash screen misses a true pair with probability
    * (1−s^r)^b. Decontamination-grade chains swap this in for
    * `dedup_filter` when the guarantee matters more than the prefix
    * join's higher (candidate-bounded, never all-pairs) cost.
    */
  def registerExactDedupFilter(
      registry: TransformRegistry, tauMilli: Long,
      keepBest: Boolean = false): Unit =
    registry.register("exact_dedup_filter", { docs: DataFrame =>
      graft.ops.Dedup.exactDedupFilterOn(docs, tauMilli, keepBest)
    })

  /** Register `replicate_epochs`: materialize an epoch-weighted
    * training mix inside a pipeline — every source pulled toward
    * `targetTokens` (each doc gains `toks` = whitespace token count if
    * absent), docs replicated or fractionally kept by the
    * deterministic hashed rounding, each copy tagged with `rep` so a
    * downstream shard/pack step can spread repeats. The weights frame
    * is |sources| rows broadcast; replication is map-side explode —
    * the one transform in the registry that legitimately EXPANDS the
    * in-flight frame.
    */
  def registerReplicateEpochs(
      registry: TransformRegistry, targetTokens: Long,
      capPermille: Long = 3000L,
      withMixKey: Boolean = false): Unit =
    registry.register("replicate_epochs", { docs: DataFrame =>
      val withToks =
        if (docs.columns.contains("toks")) docs
        else docs.withColumn("toks",
          org.apache.spark.sql.functions.size(
            org.apache.spark.sql.functions.split(col("text"), " ")).cast("long"))
      val w = graft.ops.TextAnalysis
        .epochWeightsForTokenTarget(withToks, targetTokens, capPermille)
      val rep = graft.ops.TextAnalysis.replicateByEpochs(withToks, w)
      // withMixKey: also emit the composite shard key, so a downstream
      // shardBy=mix_key load step spreads a doc's copies across shards
      val extra =
        if (withMixKey) Seq(col("rep"),
          graft.ops.Sharding.mixKey(col("doc_id"), col("rep")).as("mix_key"))
        else Seq(col("rep"))
      rep.select((docs.columns.map(col) ++ extra).toSeq: _*)
    })

  /** Register `compact_layout`: run small-files compaction on a
    * configured directory as a PIPELINE step, so the scheduler's tick
    * loop performs layout maintenance with the same A11 history /
    * running→success/error contract as data steps (streaming shard
    * and index appends accumulate small files; every deployment
    * schedules exactly this rewrite). `partitionCol` selects the
    * partition-preserving rewrite (hive layouts — IVF-PQ index, shard
    * buckets); without it the flat rewrite runs. The in-flight frame
    * passes through UNTOUCHED — the transform is a maintenance hook
    * in the fold, not a data dependency — and the rename-swap
    * discipline means a reader (or a later step) never observes a
    * half-compacted directory.
    */
  def registerCompaction(
      registry: TransformRegistry,
      spark: SparkSession,
      dir: String,
      targetFileRows: Long,
      partitionCol: Option[String] = None): Unit =
    registry.register("compact_layout", { frame: DataFrame =>
      // A streaming pipeline applies its transforms ONCE at query
      // setup, so an eager rewrite here would run at setup time — not
      // per micro-batch tick as the maintenance contract promises —
      // and would run even if the query never starts. Batch-only;
      // streaming deployments schedule compaction via the scheduler's
      // tick loop (A13) against the same directory.
      require(!frame.isStreaming,
        "compact_layout is a batch-pipeline transform: a streaming " +
          "plan would run the rewrite once at query setup, not per " +
          "tick — schedule compaction via PipelineScheduler instead")
      partitionCol match {
        case Some(pc) => graft.connect.Sources
          .compactPartitionedParquet(spark, dir, pc, targetFileRows)
        case None => graft.connect.Sources
          .compactParquet(spark, dir, targetFileRows)
      }
      frame
    })

  /** Register `compact_dedup_index`: fold an exact-dedup admission
    * index's per-tick batch directories
    * ([[graft.ops.Dedup.compactExactDedupIndex]]) as a PIPELINE step —
    * the admission-index sibling of `compact_layout`, schedulable the
    * same way (A13 tick loop, A11 history contract). The newest live
    * batch is never folded (replay safety — see the op's scaladoc), so
    * running this between streaming drains is always safe; like
    * `compact_layout` it is batch-only, because a streaming plan would
    * run the rewrite once at query setup rather than per tick.
    */
  def registerDedupIndexCompaction(
      registry: TransformRegistry,
      spark: SparkSession,
      indexPath: String): Unit =
    registry.register("compact_dedup_index", { frame: DataFrame =>
      require(!frame.isStreaming,
        "compact_dedup_index is a batch-pipeline transform: a " +
          "streaming plan would run the rewrite once at query setup, " +
          "not per tick — schedule it via PipelineScheduler instead")
      graft.ops.Dedup.compactExactDedupIndex(spark, indexPath)
      frame
    })

  /** Register `compact_semantic_dedup_index`: fold a semantic-dedup
    * admission index's per-batch generations
    * ([[graft.ops.Similarity.compactSemanticDedupIndex]]) as a
    * PIPELINE step — the embedding sibling of `compact_dedup_index`,
    * schedulable the same way. The newest live batch is never folded
    * (replay safety); duplicate rows from a crash window are
    * candidate-volume rent, folded by the next run. Batch-only for the
    * same setup-time-vs-per-tick reason as every compaction transform.
    */
  def registerSemanticDedupIndexCompaction(
      registry: TransformRegistry,
      spark: SparkSession,
      indexPath: String): Unit =
    registry.register("compact_semantic_dedup_index", { frame: DataFrame =>
      require(!frame.isStreaming,
        "compact_semantic_dedup_index is a batch-pipeline transform: a " +
          "streaming plan would run the rewrite once at query setup, " +
          "not per tick — schedule it via PipelineScheduler instead")
      graft.ops.Similarity.compactSemanticDedupIndex(spark, indexPath)
      frame
    })

  /** Register `rebucket_semantic_dedup_index`: migrate a semantic-dedup
    * admission index to a larger frozen codebook
    * ([[graft.ops.Similarity.rebucketSemanticDedupIndex]]) as a
    * PIPELINE step — the maintenance verb for a corpus that outgrew
    * its create-time k (the occupancy cliff the r17 sweep measured).
    * The admitted roster is preserved byte-identically; only the
    * comparison geometry moves. Batch-only and never concurrent with
    * an active admission, like every index-maintenance transform.
    */
  def registerSemanticDedupIndexRebucket(
      registry: TransformRegistry,
      spark: SparkSession,
      indexPath: String,
      newK: Int): Unit =
    registry.register("rebucket_semantic_dedup_index", { frame: DataFrame =>
      require(!frame.isStreaming,
        "rebucket_semantic_dedup_index is a batch-pipeline transform: a " +
          "streaming plan would run the migration once at query setup, " +
          "not per tick — schedule it via PipelineScheduler instead")
      graft.ops.Similarity.rebucketSemanticDedupIndex(spark, indexPath, newK)
      frame
    })

  /** Register `compact_bm25_index`: fold a BM25 inverted index's
    * per-batch generations ([[graft.ops.TextAnalysis.compactBm25Index]])
    * as a PIPELINE step — the retrieval-index sibling of
    * `compact_dedup_index`, schedulable the same way (A13 tick loop,
    * A11 history contract). The newest live batch is never folded
    * (replay safety) and the fold commits through the write-ahead
    * intent, so running this between streaming drains is always safe;
    * batch-only for the same setup-time-vs-per-tick reason as every
    * compaction transform.
    */
  def registerBm25IndexCompaction(
      registry: TransformRegistry,
      spark: SparkSession,
      indexPath: String): Unit =
    registry.register("compact_bm25_index", { frame: DataFrame =>
      require(!frame.isStreaming,
        "compact_bm25_index is a batch-pipeline transform: a " +
          "streaming plan would run the rewrite once at query setup, " +
          "not per tick — schedule it via PipelineScheduler instead")
      graft.ops.TextAnalysis.compactBm25Index(spark, indexPath)
      frame
    })

  /** Register `rebucket_dedup_index`: migrate an exact-dedup admission
    * index to a different bucket modulus
    * ([[graft.ops.Dedup.rebucketExactDedupIndex]]) as a PIPELINE
    * step — the exact-admission sibling of `rebucket_bm25_index`.
    * No admission decision moves; only the scan-pruning layout.
    * Batch-only and never concurrent with an active admission.
    */
  def registerDedupIndexRebucket(
      registry: TransformRegistry,
      spark: SparkSession,
      indexPath: String,
      newBuckets: Int): Unit =
    registry.register("rebucket_dedup_index", { frame: DataFrame =>
      require(!frame.isStreaming,
        "rebucket_dedup_index is a batch-pipeline transform: a " +
          "streaming plan would run the migration once at query setup, " +
          "not per tick — schedule it via PipelineScheduler instead")
      graft.ops.Dedup.rebucketExactDedupIndex(spark, indexPath, newBuckets)
      frame
    })

  /** Register `rebucket_bm25_index`: migrate a BM25 index to a
    * different bucket modulus
    * ([[graft.ops.TextAnalysis.rebucketBm25Index]]) as a PIPELINE
    * step — the retrieval sibling of `rebucket_semantic_dedup_index`,
    * for a vocabulary that outgrew its create-time bucket count.
    * Scores are bit-identical across the migration (bucketing is pure
    * layout); only serve-time pruning improves. Batch-only and never
    * concurrent with an active append, like every index-maintenance
    * transform.
    */
  def registerBm25IndexRebucket(
      registry: TransformRegistry,
      spark: SparkSession,
      indexPath: String,
      newBuckets: Int): Unit =
    registry.register("rebucket_bm25_index", { frame: DataFrame =>
      require(!frame.isStreaming,
        "rebucket_bm25_index is a batch-pipeline transform: a " +
          "streaming plan would run the migration once at query setup, " +
          "not per tick — schedule it via PipelineScheduler instead")
      graft.ops.TextAnalysis.rebucketBm25Index(spark, indexPath, newBuckets)
      frame
    })

  /** Register `score_quantile_filter`: keep the ties-inclusive top
    * `keepPermille`‰ of the in-flight frame by the shared TTR
    * permille score — the distribution-RELATIVE sibling of
    * `quality_filter`'s fixed threshold (the cut adapts to whatever
    * corpus the pipeline is currently processing). `perSource = true`
    * applies the cut within each `source` instead of globally.
    * Original columns pass through unchanged; the score is an
    * internal projection dropped on the way out.
    */
  def registerScoreQuantileFilter(
      registry: TransformRegistry, keepPermille: Long,
      perSource: Boolean = false): Unit =
    registry.register("score_quantile_filter", { docs: DataFrame =>
      val scored = docs.withColumn("__sqf_q",
        expr(graft.ops.TextAnalysis.ttrPermilleSql("text")))
      val kept =
        if (perSource)
          graft.ops.TextAnalysis.quantileFilterBy(
            scored, "source", "__sqf_q", keepPermille)
        else
          graft.ops.TextAnalysis.quantileFilterOn(
            scored, "__sqf_q", keepPermille)
      kept.drop("__sqf_q").select(docs.columns.map(col).toSeq: _*)
    })

  /** Register `window_chunk`: cut the in-flight documents into
    * fixed-size overlapping token windows
    * ([[graft.ops.TextAnalysis.windowChunkText]] — the embedding/RAG
    * ingestion shape). With `replicate_epochs`, one of the two
    * registry transforms that legitimately changes the frame's
    * GRANULARITY: rows out are (doc_id, chunk_idx, start_tok,
    * n_tokens, chunk_text), one per window. Pure per-row map — the
    * chunks stay in the scan's partitioning for a same-task
    * chunk-then-embed pipeline.
    */
  def registerWindowChunk(
      registry: TransformRegistry, win: Int, stride: Int): Unit =
    registry.register("window_chunk", { docs: DataFrame =>
      graft.ops.TextAnalysis.windowChunkText(docs, win, stride)
    })

  /** Register `curriculum_order`: attach the two-phase annealing sort
    * key ([[graft.ops.Sharding.withCurriculumOrder]]) to the in-flight
    * corpus — anneal phase = ties-inclusive top `annealPermille`‰ on
    * the shared TTR quality grid. Compose with a shard LoadStep
    * carrying `orderCol: curriculum_key`: every written shard then
    * streams the broad mix first and the top-quality slice last, at
    * no cost beyond the writer's existing within-task sort. After an
    * epoch mix, pass `keyCol = "mix_key"` so each COPY of a document
    * gets its own shuffled position within its phase (copies share
    * the phase automatically — it is a pure function of the score).
    */
  def registerCurriculumOrder(
      registry: TransformRegistry, annealPermille: Long,
      keyCol: String = "doc_id"): Unit =
    registry.register("curriculum_order", { docs: DataFrame =>
      val scored = docs.withColumn("__cur_q",
        expr(graft.ops.TextAnalysis.ttrPermilleSql("text")))
      graft.ops.Sharding
        .withCurriculumOrder(scored, keyCol, "__cur_q", annealPermille)
        .drop("__cur_q")
    })
}
