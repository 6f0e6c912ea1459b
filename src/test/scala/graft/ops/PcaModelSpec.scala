package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Frozen PCA model lifecycle: train → save → load → stateless serve.
  * Pins the three claims the lifecycle makes for the other trained
  * models too (perceptron, IVF-PQ, BPE): the parquet round-trip is
  * bit-identical, the served fold reproduces the gate-pinned training
  * projections, and the same serving columns run unchanged on a
  * stream.
  */
class PcaModelSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"
  private lazy val emb = graft.Tables.t(spark, dir, "embeddings")

  private lazy val model: Similarity.PcaModel = {
    val m = Similarity.trainPcaModel(spark, emb, k = 3)
    graft.CacheScope.drain()
    m
  }

  test("parquet round-trip is bit-identical") {
    val path = tmpDir("pca-model").resolve("m").toString
    Similarity.savePcaModel(spark, model, path)
    val loaded = Similarity.loadPcaModel(spark, path)
    assert(loaded == model)
    assert(loaded.dims == 64 && loaded.k == 3)
  }

  test("served component-1 projections equal the training-path pcaScores exactly") {
    // pcaScoresOn is the differential-gate-pinned path (q_emb_pca_scores):
    // its top-20 |proj| rows must match the frozen-model fold per vec_id
    val trainPath = Similarity.pcaScoresOn(spark, emb, Similarity.pcaRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.CacheScope.drain()
    val served = Similarity.pcaServeOn(emb, model)
      .select($"vec_id", $"pca_proj1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(trainPath.nonEmpty)
    trainPath.foreach { case (id, p) =>
      assert(served(id) == p, s"vec $id: served ${served(id)} != training $p")
    }
  }

  test("all k served projections equal an independent explode-join computation") {
    // the serving fold (literal arrays, zip_with/aggregate) vs the
    // relational shape the tools use (posexplode → center join →
    // component join → rollup): same integers for every vector and
    // every component, so the frozen model can drive the rotated
    // prefix representation of the truncation study byte-for-byte
    val e0 = emb
      .select($"vec_id", posexplode(Similarity.quantize1e4($"embedding"))
        .as(Seq("dim0", "q")))
      .select($"vec_id", ($"dim0" + 1).cast("long").as("dim"), $"q")
    val stats = e0.groupBy($"dim").agg(sum($"q").as("sq"), count(lit(1)).as("n"))
    val cx = e0.join(broadcast(stats), Seq("dim"))
      .withColumn("c", expr(
        "q - (CASE WHEN sq < 0 THEN -1L ELSE 1L END) * (abs(sq) div n)"))
      .select($"vec_id", $"dim", expr(
        "(CASE WHEN c < 0 THEN -1L ELSE 1L END) * (abs(c) div 100)").as("x"))
    val comps = model.components.zipWithIndex.flatMap { case (vs, c) =>
      vs.zipWithIndex.map { case (v, j) => ((c + 1).toLong, (j + 1).toLong, v) }
    }.toDF("component", "dim", "v")
    val joined = cx.join(broadcast(comps), Seq("dim"))
      .groupBy($"vec_id", $"component").agg(sum($"x" * $"v").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val served = Similarity.pcaServeOn(emb, model)
      .select($"vec_id", $"pca_proj1", $"pca_proj2", $"pca_proj3")
      .collect().flatMap(r => (1 to 3).map(c =>
        (r.getLong(0), c.toLong) -> r.getLong(c))).toMap
    assert(served.size == joined.size)
    served.foreach { case (k, p) =>
      assert(joined(k) == p, s"$k: served $p != join-based ${joined(k)}")
    }
  }

  test("components are mutually distinct and the model is deterministic to retrain") {
    assert(model.components.distinct.size == model.k,
      "deflation produced duplicate components")
    val again = Similarity.trainPcaModel(spark, emb, k = 3)
    graft.CacheScope.drain()
    assert(again == model, "retraining on the same corpus diverged")
  }

  test("stateless serving: batch == MemoryStream, all k projections") {
    val batch = Similarity.pcaServeOn(emb, model)
      .select($"vec_id", $"pca_proj1", $"pca_proj2", $"pca_proj3")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float])]
    val name = s"pcaserve_${System.nanoTime()}"
    val rows = emb.select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val q = Similarity.pcaServeOn(mem.toDF().toDF("vec_id", "embedding"), model)
      .select($"vec_id", $"pca_proj1", $"pca_proj2", $"pca_proj3")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      mem.addData(rows.take(200)); q.processAllAvailable()
      mem.addData(rows.drop(200)); q.processAllAvailable()
      val streamed = spark.table(name)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      assert(streamed == batch)
    } finally q.stop()
  }
}
