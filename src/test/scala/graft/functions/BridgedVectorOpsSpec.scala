package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The custom codegen vector expressions must be drop-in equivalents of
  * the higher-order-function formulations they replaced — same values
  * (including decimal HALF_UP rounding for bridged_dot) and same null
  * semantics (length mismatch / null element → null).
  */
class BridgedVectorOpsSpec extends SparkSpec {

  private def register(): Unit = GraftExtensions.register(spark)

  test("bridged_dot equals the zip_with+aggregate HOF fold bit-for-bit") {
    register()
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextGaussian() * 2).toFloat),
        Array.fill(64)((rnd.nextGaussian() * 2).toFloat))
    }
    val df = rows.toDF("id", "a", "b")
    val hof = aggregate(
      zip_with($"a", $"b", (x, y) =>
        round(x.cast("double") * y.cast("double") * lit(1e8)).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val bad = df.select($"id",
      call_function("bridged_dot", $"a", $"b").as("fast"), hof.as("slow"))
      .filter($"fast" =!= $"slow")
    assert(bad.count() == 0)
  }

  test("dot64 and sqdist64 match plain integer arithmetic") {
    register()
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (1 to 100).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextInt(100000).toLong),
        Array.fill(16)(rnd.nextInt(100000).toLong))
    }
    val got = rows.toDF("id", "a", "b")
      .select($"id",
        call_function("dot64", $"a", $"b").as("dot"),
        call_function("sqdist64", $"a", $"b").as("d2"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (i, a, b) =>
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val d2 = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      assert(got(i) == ((dot, d2)), s"row $i")
    }
  }

  test("bridged_dot non-finite elements: Round pass-through + double→long cast, no crash") {
    register()
    import spark.implicits._
    // NaN product contributes (long) NaN = 0; ±Inf contribute
    // Long.Max/MinValue — Spark Round's non-finite pass-through followed
    // by Java's primitive double→long cast (BigDecimal.valueOf would
    // throw NumberFormatException here)
    val df = Seq(
      (1L, Seq(Float.NaN, 1.0f), Seq(1.0f, 2.0f)),
      (2L, Seq(Float.PositiveInfinity), Seq(1.0f)),
      (3L, Seq(Float.NegativeInfinity), Seq(1.0f))).toDF("id", "a", "b")
    val out = df.select($"id", call_function("bridged_dot", $"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 200000000L) // 0 + 2*1e8
    assert(out(2L) == Long.MaxValue)
    assert(out(3L) == Long.MinValue)
  }

  test("null semantics: length mismatch or null element yields null") {
    register()
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), Seq(1.0f)), // length mismatch
      (2L, Seq(1.0f, 2.0f), Seq(1.0f, 2.0f))).toDF("id", "a", "b")
    val out = df.select($"id", call_function("bridged_dot", $"a", $"b").as("d"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1L).isEmpty)
    assert(out(2L).contains(500000000L)) // 1*1e8 + 2*2*1e8 = 5e8
  }
}
