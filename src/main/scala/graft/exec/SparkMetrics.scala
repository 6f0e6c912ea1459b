package graft.exec

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Shuffle/spill accounting for a block of Spark actions — the
  * observability primitive that turns PLANS.md's "one exchange, no
  * corpus shuffle" prose into NUMBERS a spec can assert and an
  * operator can alert on.
  *
  * Accounting is scoped to the measured block, not the whole
  * application: the block runs under its own job GROUP, the listener
  * records which stage ids belong to that group's jobs (stage ids are
  * unique per SparkContext), and only those stages are summed — a
  * concurrent pipeline or background streaming query on the same
  * context does not leak into the totals. All listener-side state is
  * guarded by one lock (listener events arrive on the bus thread, the
  * caller reads on its own); the bus is drained before the totals are
  * read so short jobs' final stages are counted.
  */
object SparkMetrics {

  final case class Metrics(
      shuffleReadBytes: Long,
      shuffleWriteBytes: Long,
      shuffleWriteRecords: Long,
      inputBytes: Long,
      inputRecords: Long,
      spillBytes: Long,
      stages: Long)

  /** Run `body`, return (result, metrics summed over ITS stages). */
  def measure[A](spark: SparkSession)(body: => A): (A, Metrics) = {
    val sc = spark.sparkContext
    val group = s"graft-metrics-${java.util.UUID.randomUUID()}"
    val lock = new Object
    var read, write, wrecs, in, inrecs, spill, stages = 0L
    var mine = Set.empty[Int]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val g = Option(js.properties)
          .map(_.getProperty("spark.jobGroup.id")).orNull
        if (g == group) lock.synchronized {
          mine ++= js.stageIds
        }
      }
      override def onStageCompleted(sc2: SparkListenerStageCompleted): Unit = {
        val info = sc2.stageInfo
        val m = info.taskMetrics
        lock.synchronized {
          if (m != null && mine.contains(info.stageId)) {
            read += m.shuffleReadMetrics.totalBytesRead
            write += m.shuffleWriteMetrics.bytesWritten
            wrecs += m.shuffleWriteMetrics.recordsWritten
            in += m.inputMetrics.bytesRead
            inrecs += m.inputMetrics.recordsRead
            spill += m.diskBytesSpilled
            stages += 1
          }
        }
      }
    }
    sc.addSparkListener(listener)
    sc.setJobGroup(group, "graft SparkMetrics.measure", interruptOnCancel = false)
    try {
      val a = body
      // listener events are async: drain the bus so short jobs' final
      // stages are counted before we read the totals
      org.apache.spark.graftaccess.ListenerBusAccess.drain(sc)
      val m = lock.synchronized {
        Metrics(read, write, wrecs, in, inrecs, spill, stages)
      }
      (a, m)
    } finally {
      sc.clearJobGroup()
      sc.removeSparkListener(listener)
    }
  }
}
