package graft.ops

import graft.SparkSpec

/** Product-quantization ANN ([[Similarity.pqAdc]]): the gate pins exact
  * cross-engine arithmetic; this spec pins the QUALITY claims — ADC
  * ranking must recover most of the exact-rescore ranking over the same
  * bucket candidates (quantization loss is bounded), and the recall is
  * deterministic run-to-run (seeded training, integer math).
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def top3(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("qid", "cid").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rows) => q -> rows.map(_._2).toSet }

  test("ADC top-3 recalls most of exact-rescore top-3 over the same buckets") {
    val pq = top3(Similarity.pqAdc(spark, dir))
    val exact = top3(Similarity.lshBucketed(spark, dir))
    spark.sharedState.cacheManager.clearCache()
    val qids = exact.keySet
    assert(pq.keySet == qids) // same query set, same buckets → same coverage
    val hits = qids.toSeq.map(q => (pq(q) & exact(q)).size).sum
    val recall = hits.toDouble / (qids.size * 3)
    // 4-byte codes vs exact 64-dim rescore: most neighbors must survive
    assert(recall >= 0.5, s"PQ recall@3 vs exact-in-bucket = $recall")
  }

  test("PQ result is deterministic across runs (seeded training, integer ADC)") {
    val a = Similarity.pqAdc(spark, dir).collect().toSeq
    spark.sharedState.cacheManager.clearCache()
    val b = Similarity.pqAdc(spark, dir).collect().toSeq
    spark.sharedState.cacheManager.clearCache()
    assert(a == b)
  }

  test("IVF-PQ: ADC over IVF candidates recovers most of the exact-rescore ranking") {
    // ivfWithParams at the ivfPq constants (exact rescore) and ivfPq
    // (residual-ADC shortlist + exact rescore of R rows) share the
    // SAME trained coarse quantizer, probes, and candidate lists — so
    // their divergence is pure ADC/shortlist quantization loss, the
    // same bound the sign-bucket test above pins for pqAdc
    val adcTop = top3(Similarity.ivfPq(spark, dir))
    spark.sharedState.cacheManager.clearCache()
    val exactTop = top3(Similarity.ivfWithParams(
      spark, dir, Similarity.ivfPqK, Similarity.ivfIters, Similarity.ivfPqNprobe))
    spark.sharedState.cacheManager.clearCache()
    assert(adcTop.keySet == exactTop.keySet, "same probes → same query coverage")
    val qids = exactTop.keySet
    val denom = qids.toSeq.map(q => exactTop(q).size).sum
    val hits = qids.toSeq.map(q => (adcTop(q) & exactTop(q)).size).sum
    val recall = hits.toDouble / denom
    assert(recall >= 0.5, s"IVF-PQ recall@3 vs exact-on-same-candidates = $recall")
  }

  test("IVF-PQ result is deterministic across runs") {
    val a = Similarity.ivfPq(spark, dir).collect().toSeq
    spark.sharedState.cacheManager.clearCache()
    val b = Similarity.ivfPq(spark, dir).collect().toSeq
    spark.sharedState.cacheManager.clearCache()
    assert(a == b)
  }
}
