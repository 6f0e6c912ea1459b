package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Custom codegen expression: correctness through SQL (codegen path),
  * null propagation, and analysis-time type rejection.
  */
class HammingDistanceSpec extends SparkSpec {
  import spark.implicits._

  test("hamming64 through SQL, whole-stage codegen path") {
    GraftExtensions.register(spark)
    val df = Seq(
      (0L, 0L), (5L, 3L), (Long.MaxValue, 0L), (-1L, 0L), (1L << 63, 0L))
      .toDF("a", "b")
      .selectExpr("hamming64(a, b) AS h")
    assert(df.as[Int].collect().toSeq == Seq(0, 2, 63, 64, 1))
  }

  test("null propagation") {
    GraftExtensions.register(spark)
    val out = spark.sql("SELECT hamming64(CAST(NULL AS BIGINT), CAST(5 AS BIGINT)) AS h").collect().head
    assert(out.isNullAt(0))
  }

  test("non-bigint inputs rejected at analysis") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT hamming64('x', CAST(5 AS BIGINT))").collect()
    }
    assert(e.getMessage.contains("hamming64") || e.getMessage.contains("BIGINT"))
  }

  test("interpreted eval matches codegen semantics") {
    assert(HammingDistance(
      org.apache.spark.sql.catalyst.expressions.Literal(0xF0L),
      org.apache.spark.sql.catalyst.expressions.Literal(0x0FL)).eval(null) == 8)
  }
}
