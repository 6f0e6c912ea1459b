package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: print the exchange census (hash/range/single) of catalog
  * queries' compiled plans — the numbers SkewSpec pins. Usage:
  * `runMain graft.tools.ProbeEx q_name ...`
  */
object ProbeEx {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      val plan = graft.Catalog.byName(n).fn(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      spark.sharedState.cacheManager.clearCache()
      val hx = "Exchange hashpartitioning".r.findAllIn(plan).length
      val rx = "Exchange rangepartitioning".r.findAllIn(plan).length
      val sp = "Exchange SinglePartition".r.findAllIn(plan).length
      println(s"PROBE $n hash=$hx range=$rx single=$sp")
    }
    spark.stop()
  }
}
