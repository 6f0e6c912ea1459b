package graft.ops

import graft.SparkSpec

/** Bucketing: pre-partitioned co-located joins — the at-scale answer to
  * repeated fact-fact joins on the same key (SURVEY.md "Partitioning &
  * shuffle"). Writing both sides bucketed by the join key lets
  * SortMergeJoin read buckets directly: the physical plan must contain
  * NO shuffle exchange.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val warehouse = tmpDir("graft-bucketed")
    val left = (1L to 1000L).map(i => (i % 100, s"l$i")).toDF("k", "lv")
    val right = (1L to 500L).map(i => (i % 100, i.toDouble)).toDF("k", "rv")
    left.write.mode("overwrite")
      .option("path", s"$warehouse/lb").bucketBy(8, "k").sortBy("k").saveAsTable("lb")
    right.write.mode("overwrite")
      .option("path", s"$warehouse/rb").bucketBy(8, "k").sortBy("k").saveAsTable("rb")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("lb").join(spark.table("rb"), "k")
      val physical = joined.queryExecution.executedPlan.toString
      assert(physical.contains("SortMergeJoin"))
      assert(!physical.contains("Exchange"),
        s"bucketed join must not shuffle; plan was:\n$physical")
      assert(joined.count() == 1000L * 5) // 100 keys × 10 left × 5 right
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS lb")
      spark.sql("DROP TABLE IF EXISTS rb")
    }
  }

  test("salted join equals plain join (semantics-preserving)") {
    val skewed = (1L to 2000L).map(i => (if (i % 10 == 0) 1L else i % 50, i.toDouble))
      .toDF("k", "v")
    val small = (0L until 50L).map(i => (i, s"dim$i")).toDF("dk", "d")
    val plain = skewed.join(small, $"k" === $"dk").drop("dk")
    val salted = SaltedJoin.inner(skewed, small, "k", "dk", salts = 4,
      saltBy = Seq("k", "v")).drop("dk")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
