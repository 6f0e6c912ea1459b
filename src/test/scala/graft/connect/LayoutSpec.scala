package graft.connect

import graft.SparkSpec
import graft.model.{ConnectionSpec, ExtractStep, LoadStep}
import org.apache.spark.sql.functions._

/** Source/sink format coverage (json/orc) and the data-layout scale
  * story: partitionBy writes + partition pruning visible in the scan.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("json and orc source/sink round-trips") {
    for (fmt <- Seq("json", "orc")) {
      val dir = tmpDir(s"graft-$fmt")
      val conn = ConnectionSpec("c", "c", fmt, Map("basePath" -> dir.toString))
      val df = Seq((1L, "x", 1.5), (2L, "y", 2.5)).toDF("id", "tag", "v")
      Sources.write(df, conn, LoadStep("w", 1, "c", path = Some("out"), mode = "replace"))
      val back = Sources.read(spark, conn, ExtractStep("r", 1, "c", path = Some("out")))
      assert(back.count() == 2, fmt)
      assert(back.select(sum($"v")).as[Double].head() == 4.0, fmt)
    }
  }

  test("partitioned parquet write prunes partitions at read") {
    val dir = tmpDir("graft-part")
    val df = (1 to 1000).map(i => (i.toLong, s"2024-0${i % 3 + 1}", i * 1.0))
      .toDF("id", "month", "v")
    df.write.mode("overwrite").partitionBy("month").parquet(s"$dir/t")
    val read = spark.read.parquet(s"$dir/t").filter($"month" === "2024-02")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("month"), s"expected partition pruning in:\n$plan")
    assert(read.count() == df.filter($"month" === "2024-02").count())
    // pruned scan must not read all three partition dirs
    val scanned = read.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(!scanned.contains("2024-01") || scanned.contains("PartitionFilters"))
  }
}
