package graft.exec

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Shuffle/spill accounting for a block of Spark actions — the
  * observability primitive that turns PLANS.md's "one exchange, no
  * corpus shuffle" prose into NUMBERS a spec can assert and an
  * operator can alert on. A listener sums task metrics across every
  * stage completed while the thunk runs; the caller gets exact
  * shuffle read/write bytes and records, input volume, and spill
  * bytes.
  *
  * Accounting is per-session and listener-based, so it works for any
  * composition (multi-job queries, iterative training loops) without
  * touching the measured code. Events are delivered asynchronously on
  * the listener bus — [[measure]] drains the bus before reading the
  * totals, so the numbers are complete even for short jobs.
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

  /** Run `body`, return (result, metrics summed over its stages). */
  def measure[A](spark: SparkSession)(body: => A): (A, Metrics) = {
    var read, write, wrecs, in, inrecs, spill, stages = 0L
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
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
    spark.sparkContext.addSparkListener(listener)
    try {
      val a = body
      // listener events are async: drain the bus so short jobs' final
      // stages are counted before we read the totals
      org.apache.spark.graftaccess.ListenerBusAccess.drain(spark.sparkContext)
      (a, Metrics(read, write, wrecs, in, inrecs, spill, stages))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
