package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for catalog queries to files — the
  * optimization-round evidence trail (plans/rNN/<query>_{before,after}.txt).
  *
  * Usage: PlanDump <outDir> <suffix> [query|prefix ...]
  *   (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS — same contract as Bench)
  *
  * Writes <outDir>/<query>_<suffix>.txt per query. Plans are captured at
  * the same shuffle-partition/master settings as graft.Bench so the plan
  * shape matches what the bench times. Queries whose construction runs
  * side effects (index lifecycle rows) still only PLAN here — lifecycle
  * rows execute their builds during construction, so this tool runs them
  * the same way the bench does and then snapshots the final frame's plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val pats = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val names = graft.Catalog.entries.map(_.name)
      .filter(n => pats.isEmpty || pats.exists(n.startsWith))
    names.foreach { name =>
      try {
        val df = graft.Catalog.byName(name).fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
        println(s"[plandump] $name ok (${plan.linesIterator.size} lines)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
      graft.CacheScope.drain()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
