package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Runtime row- and partition-level pruning — the two Catalyst
  * features that make selective fact⋈dim joins survive 100 TB scans:
  *
  *  - runtime BLOOM filters (InjectRuntimeFilter): a selective filter
  *    on the dim side is turned into a bloom filter evaluated inside
  *    the fact scan, so the shuffle only carries rows that can match;
  *  - DYNAMIC partition pruning: a filtered dim joined on the fact's
  *    partition column prunes fact PARTITIONS at runtime — whole files
  *    never open.
  *
  * Fixture sizes sit far below the production thresholds, so each test
  * lowers the size gates to fixture scale — asserting the MECHANISM
  * fires and results are unchanged, exactly like SkewSpec does for
  * AQE's skew split.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter is injected into the fact side of a selective shuffle join") {
    def joined = Tables.t(spark, dir, "lineitem")
      .join(
        Tables.t(spark, dir, "orders").filter($"o_orderpriority" === "1-URGENT"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").cast("long").as("qty"))
    val expected = joined.collect()

    withConf(
      // force a real shuffle join (at 100 TB neither side broadcasts)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // production gates assume ≥10 MB dims / ≥10 GB scans; fixture is KBs
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      // injected at logical optimization: a bloom_filter_agg scalar
      // subquery over the dim filter, probed via might_contain inside
      // the fact-side Filter
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain") && opt.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n$opt")
      assert(joined.collect().toSeq == expected.toSeq)
    }
  }

  test("dynamic partition pruning fires on a hive-partitioned fact table") {
    // partition orders by status into a hive layout, then join against
    // a dim row set that keeps one status: the scan must plan a
    // dynamicpruning partition filter, not read-all-partitions
    val factDir = tmpDir("dpp-fact").toString + "/orders"
    Tables.t(spark, dir, "orders")
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(factDir)
    // the dim must be FILE-backed: a LocalRelation's filter constant-
    // folds away before PartitionPruning looks for a selective
    // predicate, and no pruning subquery is planted
    val dimDir = tmpDir("dpp-dim").toString + "/dim"
    Seq(("F", "finished"), ("O", "open"), ("P", "pending"))
      .toDF("status", "label").write.mode("overwrite").parquet(dimDir)

    withConf(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true",
      // fixture stats are tiny; don't let the benefit heuristic skip
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10.0") {
      val fact = spark.read.parquet(factDir)
      val dim = spark.read.parquet(dimDir).filter($"label" === "finished")
      val q = fact.join(dim, fact("o_orderstatus") === dim("status"))
        .groupBy($"status").agg(count(lit(1)).as("n"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"no dynamic partition pruning in scan:\n$plan")
      val rows = q.collect()
      assert(rows.length == 1 && rows(0).getString(0) == "F" && rows(0).getLong(1) > 0)
    }
  }
}
