package graft.sched

import graft.SparkSpec
import graft.exec.PipelineRunner
import graft.model.PipelineSpec
import graft.store.Repository
import java.time.Instant

/** Scheduler semantics ≅ scheduler/scheduler.py:62-88: first-seen tasks
  * are scheduled but not run; due tasks run and reschedule. Clock is
  * injected — ticks are deterministic, no sleeping.
  */
class SchedulerSpec extends SparkSpec {

  private def fixture() = {
    val repo = new Repository(tmpDir("graft-sched"))
    // pipeline with zero steps: runner.run succeeds trivially
    repo.savePipeline(PipelineSpec("job", "j", Some("*/15")))
    var now = Instant.parse("2026-02-01T08:00:10Z")
    val sched = new PipelineScheduler(new PipelineRunner(spark, repo), repo, () => now, 1)
    (repo, sched, (t: Instant) => now = t)
  }

  test("first sight schedules but does not run") {
    val (_, sched, _) = fixture()
    assert(sched.tick().isEmpty) // ≅ scheduler.py:67-72
    assert(sched.scheduledFor("job").contains(Instant.parse("2026-02-01T08:15:00Z")))
  }

  test("due task runs, is rescheduled, and history records the run") {
    val (repo, sched, setNow) = fixture()
    sched.tick()
    setNow(Instant.parse("2026-02-01T08:15:05Z"))
    assert(sched.tick() == Seq("job"))
    assert(sched.scheduledFor("job").contains(Instant.parse("2026-02-01T08:30:00Z")))
    sched.stop() // waits for the worker pool to drain
    assert(repo.history("job").map(_.status) == Seq("running", "success"))
  }

  test("not-yet-due task does not run") {
    val (_, sched, setNow) = fixture()
    sched.tick()
    setNow(Instant.parse("2026-02-01T08:14:59Z"))
    assert(sched.tick().isEmpty)
  }

  test("disabled pipelines leave the schedule") {
    val (repo, sched, setNow) = fixture()
    sched.tick()
    repo.savePipeline(PipelineSpec("job", "j", Some("*/15"), enabled = false))
    setNow(Instant.parse("2026-02-01T09:00:00Z"))
    assert(sched.tick().isEmpty)
    assert(sched.scheduledFor("job").isEmpty)
  }
}
