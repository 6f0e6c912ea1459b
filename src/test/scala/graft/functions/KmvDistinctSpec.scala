package graft.functions

import graft.SparkSpec

/** KMV sketch: exact below k, bounded error above k, merge across
  * partitions (the serialize/deserialize path runs in partial→final
  * aggregation).
  */
class KmvDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("exact when distinct count is below k") {
    GraftExtensions.register(spark)
    val df = (1 to 5000).map(i => i % 300).toDF("v").repartition(8)
    val est = df.selectExpr("kmv_distinct(v) AS d").as[Long].head()
    assert(est == 300L)
  }

  test("estimates within 10% above k, constant buffer") {
    GraftExtensions.register(spark)
    val n = 100000
    val df = (1 to n).toDF("v").repartition(16)
    val est = df.selectExpr("kmv_distinct(v, 1024) AS d").as[Long].head()
    assert(math.abs(est - n).toDouble / n < 0.10, s"estimate $est for $n")
  }

  test("grouped sketches merge correctly") {
    GraftExtensions.register(spark)
    val df = (1 to 20000).map(i => (i % 4, i % 2000)).toDF("g", "v").repartition(8)
    val out = df.groupBy($"g").agg(org.apache.spark.sql.functions.expr("kmv_distinct(v)").as("d"))
      .orderBy($"g").as[(Int, Long)].collect()
    // each group sees 500 distinct values (< k) → exact
    assert(out.map(_._2).toSeq == Seq(500L, 500L, 500L, 500L))
  }
}
