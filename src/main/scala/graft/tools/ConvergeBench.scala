package graft.tools

import graft.ops.Graph
import org.apache.spark.sql.SparkSession

/** Times the CONVERGENCE-mode graph iterations (the production
  * entries; the catalog gates pin the fixed-round twins) on a fixture
  * dir's LSH pair graph: pagerankConverged to its integer tolerance
  * and kcoreConverged to the peel fixpoint. Prints one JSON line per
  * algorithm with rounds-to-convergence and wall seconds — run on the
  * hub fixtures to show convergence cost tracks graph difficulty, not
  * a hardcoded round count.
  *
  * Usage: ConvergeBench <sfDir> [tolMicro=1000] [k=3] [checkpointDir]
  *
  * With a checkpointDir the every-5th-round RELIABLE checkpoint
  * cadence is on — the production configuration whose replay bound
  * the scaladoc claims; the published table runs this mode so the
  * numbers include the checkpoint write cost.
  */
object ConvergeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tolMicro = if (args.length > 1) args(1).toLong else 1000L
    val k = if (args.length > 2) args(2).toLong else 3L
    val ckDir = if (args.length > 3) Some(args(3)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val ck = ckDir.fold("null")(d => s""""$d"""")
    val ((prN, prRounds), prSec) = time {
      val (df, r) = Graph.pagerankConvergedOnLsh(spark, sfDir, tolMicro, ckDir)
      (df.count(), r)
    }
    println(f"""{"tool":"converge","alg":"pagerank","tol_micro":$tolMicro,"rounds":$prRounds,"rows":$prN,"sec":$prSec%.2f,"checkpoint":$ck,"sf":"$sfDir"}""")
    spark.sharedState.cacheManager.clearCache(); graft.CacheScope.drain()
    val ((kcN, kcRounds), kcSec) = time {
      val (df, r) = Graph.kcoreConvergedOnLsh(spark, sfDir, k, ckDir)
      (df.count(), r)
    }
    println(f"""{"tool":"converge","alg":"kcore","k":$k,"rounds":$kcRounds,"rows":$kcN,"sec":$kcSec%.2f,"checkpoint":$ck,"sf":"$sfDir"}""")
    spark.sharedState.cacheManager.clearCache(); graft.CacheScope.drain()
    val ((lpaN, lpaRounds), lpaSec) = time {
      val (df, r) = Graph.lpaConvergedOnLsh(spark, sfDir, ckDir)
      (df.count(), r)
    }
    println(f"""{"tool":"converge","alg":"lpa","rounds":$lpaRounds,"rows":$lpaN,"sec":$lpaSec%.2f,"checkpoint":$ck,"sf":"$sfDir"}""")
    spark.stop()
  }
}
