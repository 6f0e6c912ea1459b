package graft.tools

import graft.ops.TextAnalysis
import graft.Tables
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.ConcurrentHashMap

object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new ConcurrentHashMap[String, (Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val name = sc.stageInfo.name.split("\n").head.take(60)
        val rt = sc.stageInfo.taskMetrics.executorRunTime
        stages.merge(name, (1, rt), (a, b) => (a._1 + b._1, a._2 + b._2))
      }
    })
    def time[A](tag: String)(f: => A): A = {
      stages.clear()
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(-_._2._2).take(12).foreach { case (n, (c, rt)) =>
        println(f"[probe]   $c%3d stages  ${rt / 1e3}%8.1f s-task  $n")
      }
      r
    }
    time("train") {
      TextAnalysis.bpeMergesOn(spark, Tables.t(spark, sfDir, "documents"), 6).count()
    }
    spark.sharedState.cacheManager.clearCache()
    time("encode") {
      TextAnalysis.bpeTokenCountsOn(spark, Tables.t(spark, sfDir, "documents"), 6).count()
    }
    spark.sharedState.cacheManager.clearCache()
    // batched-vs-unbatched training throughput (args: merge budget,
    // then batch widths; default 24-merge budget at B=1 vs B=8)
    val budget = args.headOption.map(_.toInt).getOrElse(24)
    val widths = if (args.length > 1) args.drop(1).toSeq.map(_.toInt) else Seq(1, 8)
    widths.foreach { b =>
      graft.CacheScope.drain()
      val t0 = System.nanoTime()
      val merges = TextAnalysis.bpeTrainBatchedOn(
        spark, Tables.t(spark, sfDir, "documents"), budget, b)._1
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache(); graft.CacheScope.drain()
      println(f"""{"tool":"bpe_batch","batch":$b,"budget":$budget,"merges":${merges.size},"sec":$dt%.2f,"merges_per_sec":${merges.size / dt}%.2f,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
