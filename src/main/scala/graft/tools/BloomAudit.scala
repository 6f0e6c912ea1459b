package graft.tools

import graft.Catalog
import org.apache.spark.sql.SparkSession

/** Which catalog rows would Spark's runtime bloom filter actually touch?
  * Builds every catalog plan with the bloom thresholds lowered to
  * fixture scale (creationSideThreshold=100MB,
  * applicationSideScanSizeThreshold=0 — the rule itself is ON by
  * default in Spark 4.x) and greps the OPTIMIZED plan for the injected
  * `might_contain` probe. Plan-only — nothing executes — so this
  * separates "the rule injected a filter" from board noise.
  *
  * Usage: BloomAudit [sfDir]  (env: SPARK_GRAFT_CPUS)
  */
object BloomAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      .config("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var injected = 0
    Catalog.entries.foreach { e =>
      try {
        val opt = e.fn(spark, sfDir).queryExecution.optimizedPlan.toString
        val hit = opt.contains("might_contain")
        if (hit) { injected += 1; println(s"BLOOM ${e.name}") }
      } catch { case ex: Throwable =>
        println(s"ERR   ${e.name}: ${ex.getMessage.take(80)}")
      }
      graft.CacheScope.drain()
      spark.sharedState.cacheManager.clearCache()
    }
    println(s"injected in $injected of ${Catalog.entries.size} plans")
    spark.stop()
  }
}
