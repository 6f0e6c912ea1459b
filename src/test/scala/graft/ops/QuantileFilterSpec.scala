package graft.ops

import graft.SparkSpec
import graft.exec.{CurationTransforms, TransformRegistry}
import org.apache.spark.sql.functions._

/** Pins the distribution-relative selection semantics of
  * [[TextAnalysis.scoreQuantileThresholdOn]] /
  * [[TextAnalysis.quantileFilterOn]] and their per-key twins:
  * ties-INCLUSIVE threshold (t = max score with count(score ≥ t) ≥
  * ⌈p·n/1000⌉), the p = 0 / p = 1000 endpoints, per-source
  * independence, and the declarative `score_quantile_filter`
  * transform ≡ the library call with original columns passed through.
  */
class QuantileFilterSpec extends SparkSpec {
  import spark.implicits._

  // scores chosen so a cut lands INSIDE a tie group: hist desc is
  // 9→2, 8→3, 7→6, 3→7, 2→8, 1→9, 0→10 (cumulative counts)
  private lazy val scored = Seq(
    (1L, 9L), (2L, 9L), (3L, 8L), (4L, 7L), (5L, 7L),
    (6L, 7L), (7L, 3L), (8L, 2L), (9L, 1L), (10L, 0L))
    .toDF("id", "q")

  private def keptIds(p: Long): Set[Long] =
    TextAnalysis.quantileFilterOn(scored, "q", p)
      .select($"id").as[Long].collect().toSet

  test("threshold lands at the exact rank when counts divide evenly") {
    // p=300 ⇒ target ⌈3⌉ = 3 ⇒ t = 8 (cum 3), kept = the top 3
    val t = TextAnalysis.scoreQuantileThresholdOn(scored, "q", 300L)
      .as[Long].head()
    assert(t == 8L)
    assert(keptIds(300L) == Set(1L, 2L, 3L))
  }

  test("a cut inside a tie group keeps the WHOLE group (ties-inclusive)") {
    // p=400 ⇒ target 4; cum jumps 3 → 6 at q=7, so the whole 7-group
    // stays: 6 kept for a 4-row target
    assert(keptIds(400L) == Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("endpoints: p=1000 keeps everything, p=0 keeps the top tie group") {
    assert(keptIds(1000L).size == 10)
    assert(keptIds(0L) == Set(1L, 2L))
    intercept[IllegalArgumentException] {
      TextAnalysis.scoreQuantileThresholdOn(scored, "q", 1001L)
    }
  }

  test("kept set is a pure predicate on the score column") {
    val t = TextAnalysis.scoreQuantileThresholdOn(scored, "q", 400L)
      .as[Long].head()
    val kept = keptIds(400L)
    val byPredicate = scored.filter($"q" >= t).select($"id").as[Long].collect().toSet
    assert(kept == byPredicate)
  }

  test("per-source thresholds are independent") {
    // srcA scores {10,9,1}, srcB scores {5,4,3,2}: p=500 ⇒ targets
    // ⌈1.5⌉=2 / 2 ⇒ thresholds 9 / 4
    val df = Seq(
      ("a", 1L, 10L), ("a", 2L, 9L), ("a", 3L, 1L),
      ("b", 4L, 5L), ("b", 5L, 4L), ("b", 6L, 3L), ("b", 7L, 2L))
      .toDF("source", "id", "q")
    val th = TextAnalysis.scoreQuantileThresholdBy(df, "source", "q", 500L)
      .as[(String, Long)].collect().toMap
    assert(th == Map("a" -> 9L, "b" -> 4L))
    val kept = TextAnalysis.quantileFilterBy(df, "source", "q", 500L)
      .select($"id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 4L, 5L))
  }

  test("score_quantile_filter transform == library call, columns passed through") {
    val docs = Seq(
      (1L, "srcA", "a b c d"),          // ttr 1000
      (2L, "srcA", "a a a a"),          // ttr 250
      (3L, "srcB", "x y z x y z"),      // ttr 500
      (4L, "srcB", "p p q q r r s t"))  // ttr 625
      .toDF("doc_id", "source", "text")
    val registry = new TransformRegistry
    CurationTransforms.registerScoreQuantileFilter(registry, keepPermille = 500L)
    val out = registry("score_quantile_filter")(docs)
    assert(out.columns.toSeq == docs.columns.toSeq)
    val expected = {
      val s = docs.withColumn("__sqf_q",
        expr(TextAnalysis.ttrPermilleSql("text")))
      TextAnalysis.quantileFilterOn(s, "__sqf_q", 500L).drop("__sqf_q")
    }
    assert(out.select($"doc_id").as[Long].collect().sorted.toSeq ==
      expected.select($"doc_id").as[Long].collect().sorted.toSeq)
    // target ⌈2⌉ ⇒ threshold 625: docs 1 and 4 survive
    assert(out.select($"doc_id").as[Long].collect().toSet == Set(1L, 4L))
  }

  test("model_quantile_filter: frozen-model margins, distribution-relative cut") {
    // separable vocabularies: the trained model puts curated docs at
    // positive margins, crawl at negative (round-1 weights ±4 per
    // bucket, 4 words per doc ⇒ margins ±16, no later updates)
    val docs = Seq(
      (1L, "cur", "alpha beta gamma alpha"),
      (2L, "cur", "beta gamma alpha beta"),
      (3L, "cur", "gamma alpha beta gamma"),
      (4L, "crawl", "zz yy xx zz"),
      (5L, "crawl", "yy xx zz yy"),
      (6L, "crawl", "xx zz yy xx")).toDF("doc_id", "source", "text")
    val model = TextAnalysis.trainQualityModel(spark, docs, Seq("cur"))
    val path = tmpDir("mqf").resolve("model").toString
    TextAnalysis.saveQualityModel(spark, model, path)

    val registry = new TransformRegistry
    CurationTransforms.registerModelQuantileFilter(
      registry, spark, path, keepPermille = 500L)
    val out = registry("model_quantile_filter")(docs)
    assert(out.columns.toSeq == docs.columns.toSeq)
    assert(out.select($"doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L))

    // the declarative cut == the library chain (score → quantile)
    val expected = {
      val s = TextAnalysis.scoreDocs(docs, model)
      TextAnalysis.quantileFilterOn(s, "margin", 500L)
        .select($"doc_id").as[Long].collect().toSet
    }
    assert(out.select($"doc_id").as[Long].collect().toSet == expected)

    // margin bucketing (granularity) coarsens the histogram but the
    // cut is still a pure margin threshold: ±16 ⇒ buckets ±2 at g=8
    val reg2 = new TransformRegistry
    CurationTransforms.registerModelQuantileFilter(
      reg2, spark, path, keepPermille = 500L, granularity = 8L)
    assert(reg2("model_quantile_filter")(docs)
      .select($"doc_id").as[Long].collect().toSet == Set(1L, 2L, 3L))

    // p=1000 keeps everything regardless of margins
    val reg3 = new TransformRegistry
    CurationTransforms.registerModelQuantileFilter(
      reg3, spark, path, keepPermille = 1000L)
    assert(reg3("model_quantile_filter")(docs).count() == 6L)
  }

  test("per-source transform variant cuts within each source") {
    val docs = Seq(
      (1L, "srcA", "a b c d"),          // ttr 1000
      (2L, "srcA", "a a a a"),          // ttr 250
      (3L, "srcB", "x y z x y z"),      // ttr 500
      (4L, "srcB", "p p q q r r s t"))  // ttr 625
      .toDF("doc_id", "source", "text")
    val registry = new TransformRegistry
    CurationTransforms.registerScoreQuantileFilter(
      registry, keepPermille = 500L, perSource = true)
    val out = registry("score_quantile_filter")(docs)
    // each source keeps its own top ⌈1⌉: docs 1 and 4
    assert(out.select($"doc_id").as[Long].collect().toSet == Set(1L, 4L))
  }
}
