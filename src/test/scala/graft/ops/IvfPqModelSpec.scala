package graft.ops

import graft.SparkSpec

/** The offline IVF-PQ split (train → save → load → index → probe)
  * must reproduce the in-row gate row EXACTLY — the gate's fused
  * training is a differential-test artifact, and this spec is the
  * proof that a deployment can train once, freeze the model on disk,
  * and serve with bit-identical results.
  */
class IvfPqModelSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("offline train/save/load/index/probe == the q_sim_ivfpq gate row") {
    val emb = graft.Tables.t(spark, dir, "embeddings")
    // ivfPqFused = the in-row fused training the DuckDB oracle mirrors
    // (the catalog's ivfPq now serves from frozen artifacts itself, so
    // the equivalence must be asserted against the FUSED form)
    val gate = Similarity.ivfPqFused(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    graft.CacheScope.drain()

    val model = Similarity.trainIvfPq(spark, emb)
    val modelPath = tmpDir("ivfpq-model").toString
    Similarity.saveIvfPqModel(model, modelPath)
    graft.CacheScope.drain()

    val loaded = Similarity.loadIvfPqModel(spark, modelPath)
    val index = Similarity.indexIvfPq(spark, emb, loaded)
    val indexPath = tmpDir("ivfpq-index").toString
    index.write.mode("overwrite").parquet(indexPath)
    graft.CacheScope.drain()

    val queries = emb.filter($"vec_id" % 50 === 0)
    val served = Similarity.probeIvfPq(spark, emb, queries, loaded,
        spark.read.parquet(indexPath))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    graft.CacheScope.drain()

    assert(served.length == gate.length && served.length > 0)
    assert(served.toSeq == gate.toSeq,
      "offline-served top-3 must be bit-identical to the gate row")

    // and the catalog row itself (train-once artifact cache + probe,
    // whatever its cache state) must equal the fused form too
    val catalogRow = Similarity.ivfPq(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    graft.CacheScope.drain()
    assert(catalogRow.toSeq == gate.toSeq,
      "served catalog row must be bit-identical to the fused training row")
  }

  test("incremental index append == full rebuild (frozen model, per-row encoding)") {
    // encoding against a FROZEN model is a pure per-row function, so a
    // daily increment parquet-appends to the serving index without
    // touching existing files — the ANN sibling of appendToShards
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.t(spark, dir, "embeddings")
    val model = Similarity.trainIvfPq(spark, emb)
    val old = emb.filter($"vec_id" % 5 =!= 0)
    val incr = emb.filter($"vec_id" % 5 === 0)
    val path = tmpDir("ivfpq-incr-index").toString
    Similarity.indexIvfPq(spark, old, model)
      .write.mode("overwrite").parquet(path)
    graft.CacheScope.drain()
    Similarity.indexIvfPq(spark, incr, model)
      .write.mode("append").parquet(path)
    graft.CacheScope.drain()
    val full = Similarity.indexIvfPq(spark, emb, model)
    val appended = spark.read.parquet(path)
    assert(appended.count() == full.count())
    assert(appended.exceptAll(full).count() == 0 &&
      full.exceptAll(appended).count() == 0,
      "appended index must equal the full rebuild row-for-row")
    graft.CacheScope.drain()
    // and probing the appended index equals probing the rebuilt one
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val a = Similarity.probeIvfPq(spark, emb, queries, model, appended).collect().toSeq
    graft.CacheScope.drain()
    val b = Similarity.probeIvfPq(spark, emb, queries, model, full).collect().toSeq
    assert(a == b)
    graft.CacheScope.drain()
  }

  test("partitioned index layout: probes prune unprobed list directories at the scan") {
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.t(spark, dir, "embeddings")
    val model = Similarity.trainIvfPq(spark, emb)
    val index = Similarity.indexIvfPq(spark, emb, model)
    val flat = tmpDir("ivfpq-flat").toString
    val part = tmpDir("ivfpq-part").toString
    index.write.mode("overwrite").parquet(flat)
    Similarity.saveIvfPqIndex(index, part)
    graft.CacheScope.drain()

    val queries = emb.filter(col("vec_id") % 50 === 0)
    // results identical across layouts (and to the in-row gate row)
    val gate = Similarity.ivfPq(spark, dir).collect().toSeq
    graft.CacheScope.drain()
    val onFlat = Similarity.probeIvfPq(spark, emb, queries, model,
      spark.read.parquet(flat)).collect().toSeq
    graft.CacheScope.drain()
    val onPart = Similarity.probeIvfPq(spark, emb, queries, model,
      spark.read.parquet(part)).collect().toSeq
    graft.CacheScope.drain()
    assert(onFlat == gate && onPart == gate)

    // and the partition layout actually prunes: scanning only a probed
    // subset of lists reads a fraction of the full layout's bytes
    val someLists = index.select(col("centroid")).distinct()
      .collect().map(_.getLong(0)).sorted.take(3)
    val (_, mFull) = graft.exec.SparkMetrics.measure(spark) {
      spark.read.parquet(part).count()
    }
    val (_, mPruned) = graft.exec.SparkMetrics.measure(spark) {
      spark.read.parquet(part)
        .filter(col("centroid").isin(someLists: _*)).count()
    }
    assert(mPruned.inputBytes * 2 < mFull.inputBytes,
      s"pruned=${mPruned.inputBytes}B full=${mFull.inputBytes}B — " +
        "directory pruning must skip unprobed lists")
    graft.CacheScope.drain()
  }

  test("grouped index layout: probe identical to flat, self-describing, fewer dirs") {
    // the fan-out fix the 100x probe motivated: listsPerDir centroids
    // per directory, group-level directory pruning + sorted-centroid
    // row-group stats inside — results must be BIT-identical to the
    // flat layout, and the layout must describe its own group width
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.t(spark, dir, "embeddings")
    val model = Similarity.trainIvfPq(spark, emb)
    val index = Similarity.indexIvfPq(spark, emb, model)
    val flat = tmpDir("ivfpq-gflat").toString
    val grouped = tmpDir("ivfpq-grp").toString
    Similarity.saveIvfPqIndex(index, flat)
    Similarity.saveIvfPqIndexGrouped(index, grouped, listsPerDir = 4)
    graft.CacheScope.drain()

    val queries = emb.filter(col("vec_id") % 50 === 0)
    val onFlat = Similarity.probeIvfPq(spark, emb, queries, model,
      spark.read.parquet(flat)).collect().toSeq
    graft.CacheScope.drain()
    val (gIdx, gWidth) = Similarity.loadIvfPqIndexLayout(spark, grouped)
    assert(gWidth.contains(4), s"marker lost: $gWidth")
    val onGrouped = Similarity.probeIvfPq(spark, emb, queries, model,
      gIdx, listsPerDir = gWidth).collect().toSeq
    graft.CacheScope.drain()
    assert(onGrouped == onFlat, "grouped layout changed probe results")

    // flat layout self-describes as ungrouped
    val (_, flatWidth) = Similarity.loadIvfPqIndexLayout(spark, flat)
    assert(flatWidth.isEmpty)
    // passing a width against a flat layout is refused loudly
    intercept[IllegalArgumentException] {
      Similarity.probeIvfPq(spark, emb, queries, model,
        spark.read.parquet(flat), listsPerDir = Some(4)).count()
    }
    graft.CacheScope.drain()

    // the point of the layout: k/listsPerDir directories, ~1 file per group
    def dirs(p: String) = new java.io.File(p).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("list_group=")
        || f.getName.startsWith("centroid="))
    val nFlat = dirs(flat).length
    val nGrouped = dirs(grouped).length
    assert(nGrouped * 3 <= nFlat,
      s"grouping should collapse directories: flat=$nFlat grouped=$nGrouped")
    graft.CacheScope.drain()

    // appends route by layout: flat append into a grouped dir refused,
    // grouped append derives the group width from the marker and keeps
    // probe results identical to a full rebuild
    intercept[IllegalArgumentException](Similarity.appendIvfPqIndex(index, grouped))
    intercept[IllegalArgumentException](Similarity.appendIvfPqIndexGrouped(index, flat))
    val part1 = emb.filter(col("vec_id") < 400)
    val part2 = emb.filter(col("vec_id") >= 400)
    val incr = tmpDir("ivfpq-grp-incr").toString
    Similarity.saveIvfPqIndexGrouped(
      Similarity.indexIvfPq(spark, part1, model), incr, listsPerDir = 4)
    Similarity.appendIvfPqIndexGrouped(
      Similarity.indexIvfPq(spark, part2, model), incr)
    graft.CacheScope.drain()
    val (iIdx, iWidth) = Similarity.loadIvfPqIndexLayout(spark, incr)
    val onIncr = Similarity.probeIvfPq(spark, emb, queries, model,
      iIdx, listsPerDir = iWidth).collect().toSeq
    graft.CacheScope.drain()
    assert(onIncr == onFlat, "grouped append != full rebuild")
  }

  test("maintainIvfPqIndex self-routes by layout; width conflicts fail the tick") {
    // the declarative/streaming maintenance entry: state the intent
    // once, every later increment routes off the _lists_per_dir marker
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.t(spark, dir, "embeddings")
    val model = Similarity.trainIvfPq(spark, emb)
    val part1 = Similarity.indexIvfPq(spark, emb.filter(col("vec_id") < 400), model)
    val part2 = Similarity.indexIvfPq(spark, emb.filter(col("vec_id") >= 400), model)
    val queries = emb.filter(col("vec_id") % 50 === 0)

    // grouped intent: first call creates, second appends, results == flat rebuild
    val g = tmpDir("ivfpq-maint-g").toString + "/idx"
    Similarity.maintainIvfPqIndex(part1, g, listsPerDir = Some(4))
    Similarity.maintainIvfPqIndex(part2, g, listsPerDir = Some(4))
    graft.CacheScope.drain()
    val flatRef = tmpDir("ivfpq-maint-ref").toString
    Similarity.saveIvfPqIndex(Similarity.indexIvfPq(spark, emb, model), flatRef)
    val ref = Similarity.probeIvfPq(spark, emb, queries, model,
      spark.read.parquet(flatRef)).collect().toSeq
    graft.CacheScope.drain()
    val (gIdx, gW) = Similarity.loadIvfPqIndexLayout(spark, g)
    val got = Similarity.probeIvfPq(spark, emb, queries, model,
      gIdx, listsPerDir = gW).collect().toSeq
    graft.CacheScope.drain()
    assert(got == ref)
    // a later tick omitting the width still routes grouped (marker wins)
    Similarity.maintainIvfPqIndex(part2, g, listsPerDir = None)
    // ...but a CONFLICTING width fails loudly before touching the layout
    intercept[IllegalArgumentException](
      Similarity.maintainIvfPqIndex(part2, g, listsPerDir = Some(8)))
    // flat intent must be EXPLICIT since r14 (grouped is the default);
    // appends stay flat once the layout exists, a grouping request on
    // a flat layout is a rebuild, not an append
    val fl = tmpDir("ivfpq-maint-f").toString + "/idx"
    Similarity.maintainIvfPqIndex(part1, fl, flat = true)
    Similarity.maintainIvfPqIndex(part2, fl)
    val (_, flW) = Similarity.loadIvfPqIndexLayout(spark, fl)
    assert(flW.isEmpty, "explicit flat intent must produce a flat layout")
    intercept[IllegalArgumentException](
      Similarity.maintainIvfPqIndex(part2, fl, listsPerDir = Some(4)))
    // default create (no width, no flat flag) is GROUPED at the default
    val d = tmpDir("ivfpq-maint-d").toString + "/idx"
    Similarity.maintainIvfPqIndex(part1, d)
    val (_, dW) = Similarity.loadIvfPqIndexLayout(spark, d)
    val expectedW = Similarity.defaultListsPerDir(
      Similarity.loadIvfPqIndexLayout(spark, d)._1
        .agg(org.apache.spark.sql.functions.max("centroid")).head().getLong(0) + 1L)
    assert(dW.contains(expectedW),
      s"default create must be grouped at the k-adaptive width $expectedW, got $dW")
    // intent contradictions fail loudly
    intercept[IllegalArgumentException](Similarity.maintainIvfPqIndex(
      part2, tmpDir("ivfpq-maint-x").toString + "/idx",
      listsPerDir = Some(4), flat = true))
    intercept[IllegalArgumentException](
      Similarity.maintainIvfPqIndex(part2, g, flat = true))
    graft.CacheScope.drain()
  }

  test("grouped-auto width comes from the model's list count, not a skewed first increment") {
    // r15 advice: a small/skewed first tick whose max centroid is far
    // below k-1 must NOT freeze a too-narrow width — the marker can
    // never be corrected without a rebuild, and probe pruning at the
    // model's real k would collapse (the r14 fixed-width regression,
    // 312->498 s at 100x, had exactly this shape)
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.t(spark, dir, "embeddings")
    val model = Similarity.trainIvfPq(spark, emb)
    val k = model.coarse.count()
    val idx = Similarity.indexIvfPq(spark, emb, model)
    // a first increment covering only low centroids (skew stand-in)
    val skewed = idx.filter(col("centroid") < 3)
    assume(skewed.limit(1).count() == 1, "fixture yields no low-centroid rows")
    val p = tmpDir("ivfpq-auto-width").toString + "/idx"
    Similarity.maintainIvfPqIndex(skewed, p, nLists = Some(k))
    val (_, w) = Similarity.loadIvfPqIndexLayout(spark, p)
    assert(w.contains(Similarity.defaultListsPerDir(k)),
      s"width must derive from the model's k=$k, got $w")
    // the inference fallback (no model at hand) still under-counts —
    // pinned so the contrast stays visible if the fallback changes
    val p2 = tmpDir("ivfpq-auto-width-fb").toString + "/idx"
    Similarity.maintainIvfPqIndex(skewed, p2)
    val (_, w2) = Similarity.loadIvfPqIndexLayout(spark, p2)
    assert(w2.exists(_ <= Similarity.defaultListsPerDir(3)),
      s"fallback width should reflect the increment's own range, got $w2")
    graft.CacheScope.drain()
  }

  test("index compaction merges per-list small files; probes and layout unchanged") {
    // incremental/streaming appends leave small files INSIDE each
    // centroid= directory; maintenance is the partition-preserving
    // compaction (the flat compactParquet would collapse the dirs and
    // destroy the scan pruning the layout exists for)
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.t(spark, dir, "embeddings")
    val model = Similarity.trainIvfPq(spark, emb)
    val path = tmpDir("ivfpq-compact").toString
    Seq(0, 1, 2).foreach { r =>
      Similarity.appendIvfPqIndex(
        Similarity.indexIvfPq(spark, emb.filter($"vec_id" % 3 === r), model), path)
      graft.CacheScope.drain()
    }
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val before = Similarity.probeIvfPq(spark, emb, queries, model,
      spark.read.parquet(path)).collect().toSeq
    assert(before.nonEmpty)
    graft.CacheScope.drain()

    val (rows, filesBefore, filesAfter) = graft.connect.Sources
      .compactPartitionedParquet(spark, path, "centroid", 1000000L)
    val listDirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(listDirs.nonEmpty && listDirs.forall(_.startsWith("centroid=")),
      s"partition layout must survive compaction, got: $listDirs")
    assert(filesAfter < filesBefore,
      s"expected fewer files after compaction: $filesBefore -> $filesAfter")
    assert(filesAfter <= listDirs.size,
      s"each list dir should collapse to one file: $filesAfter files, ${listDirs.size} dirs")

    val compacted = spark.read.parquet(path)
    assert(compacted.count() == rows)
    val after = Similarity.probeIvfPq(spark, emb, queries, model, compacted)
      .collect().toSeq
    assert(after == before, "probe results must be unchanged by compaction")
    graft.CacheScope.drain()
  }

  test("streaming ANN ingest: foreachBatch index-append, probes see every arrival") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = graft.Tables.t(spark, dir, "embeddings")
    val model = Similarity.trainIvfPq(spark, emb)
    val path = tmpDir("ivfpq-stream-index").toString + "/index"
    // bootstrap with 3/5 of the corpus, stream the rest in two batches
    Similarity.saveIvfPqIndex(
      Similarity.indexIvfPq(spark, emb.filter($"vec_id" % 5 > 1), model), path)
    graft.CacheScope.drain()
    val rows = emb.filter($"vec_id" % 5 <= 1)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        Similarity.appendIvfPqIndex(
          Similarity.indexIvfPq(spark, b.withColumn(
            "embedding", col("embedding").cast("array<float>")), model), path)
      }
      .option("checkpointLocation", tmpDir("ivfpq-stream-ck").toString)
      .start()
    try {
      mem.addData(rows.take(rows.length / 2)); q.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2)); q.processAllAvailable()
    } finally q.stop()
    graft.CacheScope.drain()
    // the streamed-in index must serve identically to a full rebuild
    val queries = emb.filter(col("vec_id") % 50 === 0)
    val streamed = Similarity.probeIvfPq(spark, emb, queries, model,
      spark.read.parquet(path)).collect().toSeq
    graft.CacheScope.drain()
    val rebuilt = Similarity.probeIvfPq(spark, emb, queries, model,
      Similarity.indexIvfPq(spark, emb, model)).collect().toSeq
    assert(streamed == rebuilt)
    graft.CacheScope.drain()
  }

  test("external query batch with clashing ids: excludeSelf=false keeps the true neighbor") {
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.t(spark, dir, "embeddings")
    val model = Similarity.trainIvfPq(spark, emb)
    val index = Similarity.indexIvfPq(spark, emb, model)
    // a fresh query batch in its OWN id space: vector 100's embedding
    // arrives labeled qid=3 — its true nearest corpus neighbor is
    // vec_id=100 (cosine 1.0), and corpus vec_id=3 must not be dropped
    // for merely sharing the id
    val queries = emb.filter($"vec_id" === 100L)
      .select(org.apache.spark.sql.functions.lit(3L).as("vec_id"), $"embedding")
    val served = Similarity.probeIvfPq(spark, emb, queries, model, index,
        excludeSelf = false)
      .filter(col("rank") === 1L).collect()
    assert(served.length == 1)
    assert(served.head.getAs[Long]("cid") == 100L,
      s"rank-1 must be the identical corpus vector, got ${served.head}")
    assert(math.abs(served.head.getAs[Double]("cos") - 1.0) < 1e-9)
    graft.CacheScope.drain()
  }

  test("index encodes every corpus vector with full code coverage") {
    val emb = graft.Tables.t(spark, dir, "embeddings")
    val model = Similarity.trainIvfPq(spark, emb)
    val index = Similarity.indexIvfPq(spark, emb, model)
    val n = emb.count()
    // pqM code rows per vector, one list assignment each
    assert(index.count() == n * Similarity.pqM)
    assert(index.select($"vec_id").distinct().count() == n)
    graft.CacheScope.drain()
  }
}
