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

  test("kmv_merge over stored kmv_state partials equals single-shot kmv_distinct — above k too") {
    GraftExtensions.register(spark)
    // 60k values, 30k distinct (well above k=1024), split into 12 parts:
    // merging the 12 stored states must reproduce the one-shot sketch
    // EXACTLY — KMV merge is lossless for the union's k minima, so the
    // k-th minimum (and hence the estimate) is identical, not just close
    val df = (1 to 60000).map(i => (i % 12, i % 30000)).toDF("part", "v").persist()
    val oneShot = df.selectExpr("kmv_distinct(v, 1024) AS d").as[Long].head()
    val merged = df.groupBy($"part")
      .agg(org.apache.spark.sql.functions.expr("kmv_state(v, 1024)").as("st"))
      .selectExpr("kmv_merge(st, 1024) AS d").as[Long].head()
    assert(merged == oneShot, s"merged $merged != one-shot $oneShot")
    df.unpersist()
  }

  test("kmv_state survives a parquet round-trip and still merges exactly") {
    GraftExtensions.register(spark)
    // the incremental-pipeline shape: daily states persisted to storage,
    // read back later by the weekly rollup
    val dir = tmpDir("kmv-states").toString
    val df = (1 to 9000).map(i => (i % 3, i % 700)).toDF("day", "v")
    df.groupBy($"day")
      .agg(org.apache.spark.sql.functions.expr("kmv_state(v)").as("st"))
      .write.mode("overwrite").parquet(dir)
    val merged = spark.read.parquet(dir)
      .selectExpr("kmv_merge(st) AS d").as[Long].head()
    assert(merged == 700L, s"700 distinct below k must be exact, got $merged")
  }
}
