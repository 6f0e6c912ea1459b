package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Stage-level profile of one catalog query: run it (with a JIT warmup
  * pass), collect per-stage wall time, task time, shuffle bytes, and rows
  * via a listener, and print stages sorted by wall time — the local-mode
  * stand-in for the Spark UI's stage table (guide §1.1/§7.1).
  *
  * Usage: StageProf <query> [warmups=1]
  *   (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val warmups = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.Catalog.byName(name).fn
    (1 to warmups).foreach { _ =>
      fn(spark, sfDir).count()
      graft.CacheScope.drain()
      spark.sharedState.cacheManager.clearCache()
    }

    final case class St(var name: String = "", var sub: Long = 0L,
      var done: Long = 0L, var taskMs: Long = 0L, var tasks: Int = 0,
      var shRead: Long = 0L, var shWrite: Long = 0L, var inRows: Long = 0L)
    val stages = mutable.LinkedHashMap.empty[Int, St]
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
        val st = stages.getOrElseUpdate(e.stageInfo.stageId, St())
        st.name = e.stageInfo.name
        st.sub = System.currentTimeMillis()
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val st = stages.getOrElseUpdate(e.stageInfo.stageId, St())
        st.name = e.stageInfo.name
        st.done = System.currentTimeMillis()
        st.tasks = e.stageInfo.numTasks
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          st.taskMs = m.executorRunTime
          st.shRead = m.shuffleReadMetrics.totalBytesRead
          st.shWrite = m.shuffleWriteMetrics.bytesWritten
          st.inRows = m.inputMetrics.recordsRead
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let the listener bus drain the final stage events
    graft.CacheScope.drain()
    spark.sharedState.cacheManager.clearCache()
    println(f"== $name%s: wall $wall%.2f s, $jobs%d jobs, ${stages.size}%d stages ==")
    val rows = stages.toSeq.sortBy { case (_, s) => -(s.done - s.sub) }
    println(f"${"stage"}%6s ${"wall_ms"}%8s ${"task_ms"}%8s ${"tasks"}%5s ${"shR_kB"}%8s ${"shW_kB"}%8s ${"inRows"}%9s  name")
    rows.take(40).foreach { case (id, s) =>
      println(f"$id%6d ${s.done - s.sub}%8d ${s.taskMs}%8d ${s.tasks}%5d ${s.shRead / 1024}%8d ${s.shWrite / 1024}%8d ${s.inRows}%9d  ${s.name.take(90)}%s")
    }
    val totalWallMs = rows.map { case (_, s) => s.done - s.sub }.sum
    println(f"sum of stage wall: ${totalWallMs / 1000.0}%.2f s (overlap possible); driver gap ≈ ${wall - totalWallMs / 1000.0}%.2f s")
    spark.stop()
  }
}
