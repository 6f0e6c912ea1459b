package graft.functions

import graft.SparkSpec

/** Unit coverage for the bloom_agg / bloom_contains SQL functions
  * (Spark's own sketch BloomFilter, exposed via GraftExtensions) —
  * the membership core of `Dedup.bloomDecontamination`.
  */
class BloomSpec extends SparkSpec {

  private def sql(q: String) = {
    GraftExtensions.register(spark)
    spark.sql(q)
  }

  test("bloom membership: every inserted value hits (no false negatives)") {
    spark.range(0, 1000).createOrReplaceTempView("bloom_in")
    val missed = sql(
      """WITH bf AS (SELECT bloom_agg(xxhash64(id), 1000L, 100000L) AS f FROM bloom_in)
        |SELECT COUNT(*) AS missed FROM bloom_in
        |WHERE NOT bloom_contains((SELECT f FROM bf), xxhash64(id))
        |""".stripMargin).head().getLong(0)
    assert(missed == 0L)
  }

  test("bloom membership: disjoint probe set has a low false-positive rate") {
    spark.range(0, 1000).createOrReplaceTempView("bloom_in2")
    spark.range(1000000, 1010000).createOrReplaceTempView("bloom_probe")
    // 100k bits / 1k items ≈ 100 bits per item → fpp way below 1e-4;
    // allow 10 of 10k probes before calling it broken
    val fps = sql(
      """WITH bf AS (SELECT bloom_agg(xxhash64(id), 1000L, 100000L) AS f FROM bloom_in2)
        |SELECT COUNT(*) AS fps FROM bloom_probe
        |WHERE bloom_contains((SELECT f FROM bf), xxhash64(id))
        |""".stripMargin).head().getLong(0)
    assert(fps <= 10L, s"false-positive count $fps out of 10000 disjoint probes")
  }

  test("bloom merge associativity: partial filters over shards equal one global build") {
    // the aggregate must behave identically however Spark partitions the
    // build side — force two different partitionings and compare probes
    val probes = (0L until 2000L by 7L)
    def flags(parts: Int): Seq[Boolean] = {
      spark.range(0, 1000).repartition(parts).createOrReplaceTempView("bloom_in3")
      spark.createDataFrame(probes.map(Tuple1(_))).toDF("p")
        .createOrReplaceTempView("bloom_probe3")
      sql(
        """WITH bf AS (SELECT bloom_agg(xxhash64(id), 1000L, 100000L) AS f FROM bloom_in3)
          |SELECT p, bloom_contains((SELECT f FROM bf), xxhash64(p)) AS hit
          |FROM bloom_probe3 ORDER BY p
          |""".stripMargin).collect().map(_.getBoolean(1)).toSeq
    }
    assert(flags(1) == flags(13))
  }

  test("gate row q_dedup_bloom: differential counts and bloom properties hold") {
    val df = graft.ops.Dedup.bloomDecontamination(spark, "/root/testdata/sf0.001")
    val row = df.head()
    assert(row.getLong(row.fieldIndex("n_bench_shingles")) > 0)
    assert(row.getBoolean(row.fieldIndex("no_false_negatives")))
    assert(row.getBoolean(row.fieldIndex("fp_rate_ok")))
  }
}
