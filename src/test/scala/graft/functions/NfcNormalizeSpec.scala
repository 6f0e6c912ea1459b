package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[NfcNormalize]] — semantics plus codegen/interpreted parity (the
  * two execution paths share one normalize call, but the parity check
  * is what catches a codegen template drifting from nullSafeEval).
  */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def run(wholeStage: Boolean) = {
    GraftExtensions.register(spark)
    val old = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", wholeStage.toString)
    try Seq(
      "résumé", // decomposed é twice
      "résumé", // already composed — idempotent
      "Ångström", // ring + diaeresis
      "plain ascii", "")
      .toDF("s")
      .select(expr("nfc_normalize(s)").as("n"), length($"s").as("l0"),
        length(expr("nfc_normalize(s)")).as("l1"))
      .collect()
    finally spark.conf.set("spark.sql.codegen.wholeStage", old)
  }

  test("composes combining marks, idempotent on composed, null-safe") {
    val rows = run(wholeStage = true)
    assert(rows(0).getString(0) == "résumé")
    assert(rows(0).getInt(1) == 8 && rows(0).getInt(2) == 6)
    assert(rows(1).getString(0) == "résumé" && rows(1).getInt(1) == 6)
    assert(rows(2).getString(0) == "Ångström")
    assert(rows(3).getString(0) == "plain ascii")
    assert(rows(4).getString(0) == "")

    val nullRow = Seq(Option.empty[String]).toDF("s")
      .select(expr("nfc_normalize(s)")).collect()
    assert(nullRow(0).isNullAt(0))
  }

  test("interpreted path matches codegen path") {
    assert(run(wholeStage = true).toSeq == run(wholeStage = false).toSeq)
  }
}
