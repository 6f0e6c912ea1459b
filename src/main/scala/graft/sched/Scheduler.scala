package graft.sched

import graft.exec.PipelineRunner
import graft.store.Repository
import java.time.Instant
import java.util.concurrent.{ConcurrentHashMap, Executors, TimeUnit}
import scala.jdk.CollectionConverters._

/** Scheduler ≅ scheduler/scheduler.py:23-88 (SURVEY.md §2.A A13):
  * every tick, reload enabled pipelines; a pipeline seen for the first
  * time is only *scheduled* (never run immediately —
  * scheduler.py:67-72); a due pipeline runs and is rescheduled from its
  * cron. Differences from the reference: runs submit to a bounded
  * executor pool (not an unbounded thread-per-task), and the clock is
  * injected so ticks are unit-testable without sleeping. Spark supplies
  * all intra-run parallelism.
  */
final class PipelineScheduler(
    runner: PipelineRunner,
    repo: Repository,
    clock: () => Instant = () => Instant.now(),
    workers: Int = 4) {

  private val nextRuns = new ConcurrentHashMap[String, Instant]()
  private val pool = Executors.newFixedThreadPool(workers)
  private val ticker = Executors.newSingleThreadScheduledExecutor()

  /** One scheduling pass (≅ _check_and_run_tasks, scheduler.py:62-80).
    * Returns ids submitted this tick.
    */
  def tick(): Seq[String] = {
    val now = clock()
    val enabled = repo.listEnabled()
    // drop disabled/deleted pipelines from the schedule
    val live = enabled.map(_.id).toSet
    nextRuns.keySet.asScala.filterNot(live).foreach(nextRuns.remove)
    enabled.flatMap { p =>
      val cron = p.recurrence.getOrElse("*") // every minute if unset
      nextRuns.get(p.id) match {
        case null =>
          nextRuns.put(p.id, CronParser.nextRun(cron, now)) // first seen: schedule only
          None
        case due if !due.isAfter(now) =>
          nextRuns.put(p.id, CronParser.nextRun(cron, now))
          pool.submit(new Runnable {
            def run(): Unit =
              try runner.run(p)
              catch { case _: Exception => () } // history already has the error
          })
          Some(p.id)
        case _ => None
      }
    }
  }

  /** Start the 30 s polling loop (≅ scheduler.py:23). */
  def start(intervalSeconds: Long = 30): Unit =
    ticker.scheduleAtFixedRate(() => tick(), 0, intervalSeconds, TimeUnit.SECONDS)

  def stop(): Unit = {
    ticker.shutdownNow()
    pool.shutdown()
    pool.awaitTermination(30, TimeUnit.SECONDS)
  }

  def scheduledFor(id: String): Option[Instant] = Option(nextRuns.get(id))
}
