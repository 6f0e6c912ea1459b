package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic decontamination: corpus rows within cosine τ of any
  * benchmark vector are dropped, exactly and only those. Pins the
  * no-false-negative contract (exact full-dim comparison), the
  * threshold boundary (cos = 1.0 survives τ = 1000), pass-through of
  * corpus columns, and the declarative twin.
  */
class SemanticDecontamSpec extends SparkSpec {
  import spark.implicits._

  private def mkCorpus(seed: Long, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map(id =>
      (id, Array.fill(32)(rnd.nextGaussian().toFloat), s"doc$id"))
  }

  test("drops exactly the corpus rows near a benchmark vector, keeps columns") {
    val corpus = mkCorpus(41, 100)
    val corpusDf = corpus.toDF("vec_id", "embedding", "payload")
    // bench: perturbed copies of rows 10/20/30 plus two unrelated vectors
    val rnd = new scala.util.Random(99)
    def perturb(x: Array[Float]) = x.map(v => v + (rnd.nextGaussian() * 0.01).toFloat)
    val bench = (Seq(10, 20, 30).map(i => (1000L + i, perturb(corpus(i)._2))) ++
      Seq((2001L, Array.fill(32)(rnd.nextGaussian().toFloat)),
        (2002L, Array.fill(32)(rnd.nextGaussian().toFloat))))
      .toDF("vec_id", "embedding")
    val kept = Similarity.semanticDecontaminate(spark, corpusDf, bench, tauMilli = 950L)
    graft.CacheScope.drain()
    assert(kept.columns.toSeq == corpusDf.columns.toSeq)
    val keptIds = kept.select($"vec_id").as[Long].collect().toSet
    assert(keptIds == (0L until 100L).toSet -- Set(10L, 20L, 30L),
      s"dropped ${(0L until 100L).toSet -- keptIds}")
    // payload survives untouched for a kept row
    assert(kept.filter($"vec_id" === 7L).select($"payload").as[String].head() == "doc7")
  }

  test("threshold boundary: an exact copy is dropped even at tau=1000") {
    val corpus = mkCorpus(43, 20)
    val corpusDf = corpus.toDF("vec_id", "embedding", "payload")
    val bench = Seq((9000L, corpus(5)._2)).toDF("vec_id", "embedding")
    val kept = Similarity.semanticDecontaminate(spark, corpusDf, bench, tauMilli = 1000L)
      .select($"vec_id").as[Long].collect().toSet
    graft.CacheScope.drain()
    assert(!kept.contains(5L), "exact copy (cos=1.0) must be dropped at tau=1000")
    assert(kept.size == 19, s"only the exact copy should drop at tau=1000, kept $kept")
  }

  test("bench size guard: an oversized bench frame errors loudly, at-cap passes") {
    // the broadcast-exactness contract only holds for benchmark-sized
    // frames — a corpus passed as `bench` must ERROR with a pointer to
    // the bloom/shingle path, not OOM executors mid-broadcast
    val corpusDf = mkCorpus(53, 30).toDF("vec_id", "embedding", "payload")
    val bigBench = mkCorpus(59, 20).map(t => (t._1, t._2)).toDF("vec_id", "embedding")
    val err = intercept[IllegalArgumentException] {
      Similarity.semanticDecontaminate(spark, corpusDf, bigBench,
        tauMilli = 950L, maxBenchRows = 10L)
    }
    graft.CacheScope.drain()
    assert(err.getMessage.contains("maxBenchRows=10") &&
      err.getMessage.contains("bloom"),
      s"guard must name the cap and the corpus-scale alternative: ${err.getMessage}")
    // boundary inclusive: exactly-at-cap still runs
    val kept = Similarity.semanticDecontaminate(spark, corpusDf, bigBench,
      tauMilli = 1000L, maxBenchRows = 20L)
    assert(kept.count() >= 0L)
    graft.CacheScope.drain()
  }

  test("declarative twin equals the library call") {
    import graft.exec.{CurationTransforms, TransformRegistry}
    val corpusDf = mkCorpus(47, 50).toDF("vec_id", "embedding", "payload")
    val benchPath = tmpDir("semdecon-bench").resolve("b").toString
    mkCorpus(47, 50).take(3).map(t => (t._1 + 5000L, t._2))
      .toDF("vec_id", "embedding").write.parquet(benchPath)
    val registry = new TransformRegistry
    CurationTransforms.registerSemanticDecontaminate(registry, benchPath, 990L)
    val viaTransform = registry("semantic_decontaminate")(corpusDf)
      .select($"vec_id").as[Long].collect().toSet
    graft.CacheScope.drain()
    val direct = Similarity.semanticDecontaminate(spark, corpusDf,
        spark.read.parquet(benchPath), 990L)
      .select($"vec_id").as[Long].collect().toSet
    graft.CacheScope.drain()
    assert(viaTransform == direct)
    // the bench is copies of rows 0/1/2, so exactly those are gone
    assert(direct == (3L until 50L).toSet)
  }
}
