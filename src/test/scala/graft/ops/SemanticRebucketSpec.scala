package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic-admission codebook migration
  * (Similarity.rebucketSemanticDedupIndex — r17 verdict ask #3): the
  * occupancy sweep proved the scale cliff of an undersized frozen
  * codebook (k=4 degrades per-tick admission 7.2× AND caps pair-stage
  * parallelism at 4 partitions), and rebucketing is the migration
  * path. The contract under test: the admitted SET is history and is
  * preserved byte-identical (no re-litigation), the layout becomes
  * consistent with the new codebook, post-migration admits match a
  * from-scratch index at the new k given the same history, the live
  * generation survives as a replay unit, and a crash anywhere after
  * the intent replays to the identical end state from every entry
  * point.
  */
class SemanticRebucketSpec extends SparkSpec {
  import spark.implicits._

  private def v(x: Double*): Array[Float] = x.map(_.toFloat).toArray

  // the SemanticAdmitSpec hand corpus: admitted set {0, 1, 5, 8, 10}
  // after the three batches at τ = 0.95 under a k = 1 codebook —
  // pairwise non-dup globally, so a larger-k re-clustering cannot
  // create new same-cluster dup pairs among them
  private val b0 = Seq(
    0L -> v(10, 0, 0, 0), 1L -> v(0, 10, 0, 0), 2L -> v(10, 0.2, 0, 0))
  private val b1 = Seq(
    3L -> v(10, 0.4, 0, 0), 4L -> v(10, 0.45, 0, 0),
    5L -> v(0, 0, 10, 0), 6L -> v(0, 0, 10, 0.1), 7L -> v(0, 9.8, 0.5, 0))
  private val b2 = Seq(
    8L -> v(0, 0, 0, 10), 9L -> v(10, 0, 0.3, 0), 10L -> v(0, 0, 0, -10))
  private def df(rows: Seq[(Long, Array[Float])]) =
    rows.toDF("vec_id", "embedding")

  /** Create at k = 1 and admit the three batches (admitted {0,1,5,8,10},
    * generations 0/1/2 with 2 the live one). */
  private def populatedIndex(name: String): String = {
    val path = tmpDir(name).toString + "/semidx"
    Similarity.createSemanticDedupIndex(spark, path,
      df(b0 ++ b1 ++ b2), tauMilli = 950L, k = 1, iters = 1)
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      Similarity.admitSemanticDedup(df(b), path, i.toLong).count()
    }
    graft.CacheScope.drain()
    path
  }

  private def roster(path: String): Set[(Long, Seq[Long], Long)] =
    spark.read.option("basePath", s"$path/vecs").parquet(s"$path/vecs")
      .select($"vec_id", $"xq", $"n2")
      .as[(Long, Seq[Long], Long)].collect().toSet

  private def layout(path: String): Set[(Long, Long, Long)] =
    spark.read.option("basePath", s"$path/vecs").parquet(s"$path/vecs")
      .select($"vec_id", $"batch".cast("long"), $"centroid".cast("long"))
      .as[(Long, Long, Long)].collect().toSet

  private def admitIds(batch: Seq[(Long, Array[Float])], path: String,
      id: Long): Set[Long] = {
    val out = Similarity.admitSemanticDedup(df(batch), path, id)
      .select($"vec_id").as[Long].collect().toSet
    graft.CacheScope.drain()
    out
  }

  test("rebucket preserves the admitted roster byte-identically and re-partitions by the new codebook") {
    val path = populatedIndex("graft-rebucket-basic")
    val before = roster(path)
    assert(before.map(_._1) == Set(0L, 1L, 5L, 8L, 10L))
    val tauBefore = graft.connect.Hfs.readSmall(
      graft.connect.Hfs.fs(spark, path),
      new org.apache.hadoop.fs.Path(path, "_sem_tau_milli"))
    assert(Similarity.rebucketSemanticDedupIndex(spark, path, newK = 2) == 5L)
    graft.CacheScope.drain()
    // the admitted set is history: same (vec_id, xq, n2) bytes
    assert(roster(path) == before,
      "rebucket changed the admitted roster — it must never re-litigate")
    assert(graft.connect.Hfs.readSmall(graft.connect.Hfs.fs(spark, path),
      new org.apache.hadoop.fs.Path(path, "_sem_tau_milli")) == tauBefore)
    // generation structure: folded {0,1} consolidated into one negative
    // generation; the live batch 2 keeps its id (replay unit intact)
    val l = layout(path)
    assert(l.collect { case (id, b, _) if b >= 0 => (id, b) } ==
      Set((8L, 2L), (10L, 2L)))
    assert(l.collect { case (id, b, _) if b < 0 => id } == Set(0L, 1L, 5L))
    assert(l.map(_._2).filter(_ < 0).size <= l.size) // one negative gen id
    assert(l.collect { case (_, b, _) if b < 0 => b }.size == 1)
    // every vector sits in its argmin-L2 cluster of the NEW codebook
    // (exact integer distance, ties by cid — recomputed independently)
    val cents = spark.read.parquet(s"$path/centroids")
      .select($"cid", $"cq").as[(Long, Seq[Long])].collect()
    assert(cents.length == 2, s"expected a 2-centroid codebook, got ${cents.length}")
    val xqOf = before.map(r => r._1 -> r._2).toMap
    l.foreach { case (id, _, c) =>
      val x = xqOf(id)
      val want = cents.map { case (cid, cq) =>
        (x.zip(cq).map { case (a, b) => val d = a - b; d * d }.sum, cid)
      }.min._2
      assert(c == want, s"vector $id sits in cluster $c, argmin is $want")
    }
  }

  test("post-migration admits match a from-scratch index at the new k given the same history") {
    val migrated = populatedIndex("graft-rebucket-admit-m")
    Similarity.rebucketSemanticDedupIndex(spark, migrated, newK = 2)
    graft.CacheScope.drain()
    // the comparator the contract names: an index CREATED at the new k
    // whose codebook trains on the same roster (ids 0 and 1 are in the
    // roster, so the create-time seed rule coincides with the rank
    // seeds) and whose history is bulk-loaded as one generation — the
    // roster is pairwise non-dup, so bulk admission re-litigates
    // nothing and plants exactly the same vectors
    val admitted = b0 ++ b1 ++ b2
    val rosterRows = admitted.filter(r => Set(0L, 1L, 5L, 8L, 10L)(r._1))
    val fresh = tmpDir("graft-rebucket-admit-f").toString + "/semidx"
    Similarity.createSemanticDedupIndex(spark, fresh, df(rosterRows),
      tauMilli = 950L, k = 2, iters = Similarity.ivfIters)
    assert(admitIds(rosterRows, fresh, 0L) == Set(0L, 1L, 5L, 8L, 10L))
    // the two indexes must carry the SAME codebook (deterministic
    // training on the same vectors and seeds) ...
    val cb = (p: String) => spark.read.parquet(s"$p/centroids")
      .select($"cid", $"cq").as[(Long, Seq[Long])].collect().toSet
    assert(cb(migrated) == cb(fresh),
      "migrated codebook diverged from the from-scratch training")
    // ... and make identical decisions on a new batch: 20 rejects
    // against admitted 0, 21 against 5, 22/23 admit (22 is close to 1
    // but under τ; 23 is novel)
    val b3 = Seq(
      20L -> v(10, 0.1, 0, 0), 21L -> v(0, 0.2, 10, 0),
      22L -> v(0, 9, 4.5, 0), 23L -> v(5, 0, 0, -9))
    val m = admitIds(b3, migrated, 3L)
    val f = admitIds(b3, fresh, 1L)
    assert(m == f, s"migrated admits $m != from-scratch admits $f")
    assert(m == Set(22L, 23L), s"hand-check drifted: $m")
  }

  test("replaying the live batch after a rebucket is still idempotent") {
    val path = populatedIndex("graft-rebucket-replay")
    Similarity.rebucketSemanticDedupIndex(spark, path, newK = 2)
    graft.CacheScope.drain()
    val before = layout(path)
    // the stream restarts and replays its last batch: the live
    // generation (batch 2, reassigned in place) must be deleted and
    // recomputed, not self-reject against its own migrated rows
    assert(admitIds(b2, path, 2L) == Set(8L, 10L))
    val after = layout(path)
    assert(after.map(r => (r._1, r._2)) == before.map(r => (r._1, r._2)),
      s"live-batch replay changed the roster: $before -> $after")
  }

  test("a crash after the intent replays to the uninterrupted end state from any entry point") {
    import org.apache.hadoop.fs.Path
    import graft.connect.Hfs
    // twin A runs the uninterrupted migration = the reference state
    val a = populatedIndex("graft-rebucket-crash-a")
    Similarity.rebucketSemanticDedupIndex(spark, a, newK = 2)
    graft.CacheScope.drain()
    // twin B (identical pre-state): stage exactly what B's rebucket
    // would stage — training is deterministic, so A's COMMITTED output
    // is byte-what B would have staged — write the intent, and STOP
    // (the simulated crash right after the commit point)
    val b = populatedIndex("graft-rebucket-crash-b")
    val bfs = Hfs.fs(spark, b)
    spark.read.option("basePath", s"$a/vecs").parquet(s"$a/vecs")
      .filter($"batch" < 0).drop("batch")
      .repartition(col("centroid")).write.mode("overwrite")
      .partitionBy("centroid").parquet(s"$b/vecs/.compact-tmp")
    spark.read.option("basePath", s"$a/vecs").parquet(s"$a/vecs")
      .filter($"batch" === 2).drop("batch")
      .repartition(col("centroid")).write.mode("overwrite")
      .partitionBy("centroid").parquet(s"$b/vecs/.rebucket-live-tmp")
    spark.read.parquet(s"$a/centroids")
      .write.mode("overwrite").parquet(s"$b/.rebucket-centroids")
    Hfs.writeSmall(bfs, new Path(b, "_sem_rebucket_intent"),
      "-1 2 0,1", overwrite = true)
    // a LATER crash point on a third twin: the fold deletes already
    // ran, nothing renamed yet — the half-migrated middle a reader
    // must never observe
    val c = populatedIndex("graft-rebucket-crash-c")
    val cfs = Hfs.fs(spark, c)
    Seq("vecs/.compact-tmp", "vecs/.rebucket-live-tmp").foreach { sub =>
      val src = new Path(b, sub)
      org.apache.hadoop.fs.FileUtil.copy(bfs, src, cfs, new Path(c, sub),
        false, spark.sparkContext.hadoopConfiguration)
    }
    org.apache.hadoop.fs.FileUtil.copy(bfs, new Path(b, ".rebucket-centroids"),
      cfs, new Path(c, ".rebucket-centroids"), false,
      spark.sparkContext.hadoopConfiguration)
    Hfs.writeSmall(cfs, new Path(c, "_sem_rebucket_intent"),
      "-1 2 0,1", overwrite = true)
    Seq(0L, 1L).foreach(g =>
      Hfs.deleteIfExists(cfs, new Path(c, s"vecs/batch=$g")))
    // entry points replay: admit on B, compact on C
    assert(admitIds(Seq(30L -> v(10, 0.05, 0, 0)), b, 3L).isEmpty) // dup of 0
    assert(Similarity.compactSemanticDedupIndex(spark, c) == 0)
    graft.CacheScope.drain()
    for (p <- Seq(b, c)) {
      assert(!Hfs.fs(spark, p).exists(new Path(p, "_sem_rebucket_intent")))
      assert(layout(p).map(r => (r._1, r._3)) == layout(a).map(r => (r._1, r._3)),
        s"replayed state of $p diverged from the uninterrupted migration")
      assert(spark.read.parquet(s"$p/centroids").collect().toSet ==
        spark.read.parquet(s"$a/centroids").collect().toSet)
    }
    // B additionally carries batch 3's (empty) admission — no rows, so
    // the generation layout still matches A's batch partitioning
    assert(layout(b).map(_._2).filter(_ >= 0) == Set(2L))
  }

  test("single-live-generation rebucket: empty fold list, and its crash intent still parses and replays") {
    // only one generation exists → fold is EMPTY and the intent's
    // trailing fold field trims away entirely; recovery must read that
    // as "nothing to fold", not a corrupt marker
    val path = tmpDir("graft-rebucket-single").toString + "/semidx"
    Similarity.createSemanticDedupIndex(spark, path, df(b0 ++ b1 ++ b2),
      tauMilli = 950L, k = 1, iters = 1)
    Similarity.admitSemanticDedup(df(b0), path, 0L).count()
    graft.CacheScope.drain()
    assert(Similarity.rebucketSemanticDedupIndex(spark, path, newK = 2) == 2L)
    graft.CacheScope.drain()
    val l = layout(path)
    assert(l.map(r => (r._1, r._2)) == Set((0L, 0L), (1L, 0L)),
      s"live generation must survive under its own id: $l")
    // crash form: stage a live tmp + codebook + the two-token intent
    // (what a crash right after the commit point leaves), then any
    // entry replays it
    val path2 = tmpDir("graft-rebucket-single2").toString + "/semidx"
    Similarity.createSemanticDedupIndex(spark, path2, df(b0 ++ b1 ++ b2),
      tauMilli = 950L, k = 1, iters = 1)
    Similarity.admitSemanticDedup(df(b0), path2, 0L).count()
    graft.CacheScope.drain()
    spark.read.option("basePath", s"$path/vecs").parquet(s"$path/vecs/batch=0")
      .drop("batch").repartition(col("centroid"))
      .write.mode("overwrite").partitionBy("centroid")
      .parquet(s"$path2/vecs/.rebucket-live-tmp")
    spark.read.parquet(s"$path/centroids")
      .write.mode("overwrite").parquet(s"$path2/.rebucket-centroids")
    val fs2 = graft.connect.Hfs.fs(spark, path2)
    graft.connect.Hfs.writeSmall(fs2,
      new org.apache.hadoop.fs.Path(path2, "_sem_rebucket_intent"),
      "-1 0", overwrite = true) // the trimmed two-token form
    assert(admitIds(Seq(50L -> v(10, 0.05, 0, 0)), path2, 1L).isEmpty) // dup of 0
    assert(!fs2.exists(new org.apache.hadoop.fs.Path(path2, "_sem_rebucket_intent")))
    assert(spark.read.parquet(s"$path2/centroids").count() == 2L)
    graft.CacheScope.drain()
  }

  test("rebucket_semantic_dedup_index transform: schedulable maintenance step, streaming refused") {
    val path = populatedIndex("graft-rebucket-transform")
    val registry = new graft.exec.TransformRegistry
    graft.exec.CurationTransforms.registerSemanticDedupIndexRebucket(
      registry, spark, path, newK = 2)
    val before = roster(path)
    val frame = df(b0) // the in-flight frame passes through untouched
    assert(registry("rebucket_semantic_dedup_index")(frame) eq frame)
    graft.CacheScope.drain()
    assert(roster(path) == before)
    assert(spark.read.parquet(s"$path/centroids").count() == 2L)
    // a streaming frame is refused loudly (setup-time-vs-per-tick)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val e = intercept[IllegalArgumentException] {
      registry("rebucket_semantic_dedup_index")(mem.toDF())
    }
    assert(e.getMessage.contains("batch-pipeline transform"))
  }

  test("loud failure modes: not an index, empty index, bad k") {
    val e1 = intercept[IllegalArgumentException] {
      Similarity.rebucketSemanticDedupIndex(spark,
        tmpDir("graft-rebucket-noidx").toString, 2)
    }
    assert(e1.getMessage.contains("not a semantic-dedup index"))
    val empty = tmpDir("graft-rebucket-empty").toString + "/semidx"
    Similarity.createSemanticDedupIndex(spark, empty, df(b0),
      tauMilli = 950L, k = 1, iters = 1)
    graft.CacheScope.drain()
    val e2 = intercept[IllegalArgumentException] {
      Similarity.rebucketSemanticDedupIndex(spark, empty, 2)
    }
    assert(e2.getMessage.contains("no admitted vectors"))
    val e3 = intercept[IllegalArgumentException] {
      Similarity.rebucketSemanticDedupIndex(spark, empty, 0)
    }
    assert(e3.getMessage.contains("positive"))
  }
}
