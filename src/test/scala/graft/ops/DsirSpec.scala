package graft.ops

import graft.SparkSpec

/** Semantic checks for DSIR importance resampling beyond the
  * differential gate: the selection must prefer documents whose hashed
  * n-gram profile matches the target pool, deterministically.
  */
class DsirSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("selection is deterministic and excludes the target pool") {
    val a = TextAnalysis.dsirSelect(spark, dir).collect()
    val b = TextAnalysis.dsirSelect(spark, dir).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 20)
    assert(a.forall(_.getString(1) != "src0"))
    // skey = weight + gumbel micronats: ordering key strictly
    // non-increasing with doc_id tiebreak
    val skeys = a.map(r => r.getLong(r.fieldIndex("skey")))
    assert(skeys.sameElements(skeys.sorted(Ordering[Long].reverse)))
  }

  test("importance weights separate target-like from non-target-like profiles") {
    import spark.implicits._
    // the selected docs' mean weight must beat the full non-target
    // pool's mean weight — Gumbel noise (±~5e6 micronats) perturbs the
    // boundary but cannot invert the aggregate preference
    val sel = TextAnalysis.dsirSelect(spark, dir)
      .agg(org.apache.spark.sql.functions.avg($"weight")).head().getDouble(0)
    val all = TextAnalysis.dsirWeights(spark, dir)
      .agg(org.apache.spark.sql.functions.avg($"weight")).head().getDouble(0)
    assert(sel > all,
      s"selected mean weight $sel should exceed pool mean $all")
  }
}
