package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The band-bucketed range join must be pair-exact vs the direct theta
  * join it replaced — including interval-boundary hits (|c−s| exactly
  * 100), negative balances, and values far apart. The catalog oracle
  * already checks this on the fixture; this spec drives the adversarial
  * cases (exact bin edges, bin-straddling pairs) that a smooth fixture
  * distribution may never produce.
  */
class RangeJoinSpec extends SparkSpec {

  test("banded equi-join equals brute-force BETWEEN join, boundaries included") {
    import spark.implicits._
    val dir = tmpDir("range-join").toString
    val rnd = new scala.util.Random(19)
    // adversarial values: exact multiples of the bin width, ±100-apart
    // pairs, negatives, plus uniform noise with 2-decimal money values
    val supBals = Seq(-500.0, -100.0, 0.0, 100.0, 200.0, 999.99) ++
      (1 to 200).map(_ => (rnd.nextInt(200000) - 100000) / 100.0)
    val custBals = supBals.flatMap(s => Seq(s - 100.0, s + 100.0, s - 100.01, s + 100.01)) ++
      (1 to 400).map(_ => (rnd.nextInt(200000) - 100000) / 100.0)
    supBals.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("s_suppkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    custBals.toDF("c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

    val got = Joins.rangeJoin(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force on the driver: BETWEEN is inclusive on both ends
    val expected = supBals.zipWithIndex.map { case (s, i) =>
      i.toLong -> custBals.count(c => c >= s - 100.0 && c <= s + 100.0).toLong
    }.filter(_._2 > 0).toMap
    assert(got == expected)
  }
}
