package graft.sched

import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite

/** Reference semantics: scheduler/cron_parser.py:4-42 — minute field
  * cases star / step / fixed; next run strictly in the future at minute
  * granularity.
  */
class CronParserSpec extends AnyFunSuite {
  private val t0 = Instant.parse("2026-01-15T10:23:45Z")

  test("star runs next minute") {
    assert(CronParser.nextRun("*", t0) == Instant.parse("2026-01-15T10:24:00Z"))
  }

  test("step */15 picks next multiple") {
    assert(CronParser.nextRun("*/15", t0) == Instant.parse("2026-01-15T10:30:00Z"))
  }

  test("fixed minute before now rolls to next hour") {
    assert(CronParser.nextRun("5", t0) == Instant.parse("2026-01-15T11:05:00Z"))
  }

  test("fixed minute later this hour stays in hour") {
    assert(CronParser.nextRun("45", t0) == Instant.parse("2026-01-15T10:45:00Z"))
  }

  test("minute+hour spec") {
    assert(CronParser.nextRun("30 2", t0) == Instant.parse("2026-01-16T02:30:00Z"))
  }

  test("exactly-at-boundary schedules the NEXT match (strictly future)") {
    val onBoundary = Instant.parse("2026-01-15T10:30:00Z")
    assert(CronParser.nextRun("*/15", onBoundary) == Instant.parse("2026-01-15T10:45:00Z"))
  }

  test("invalid specs rejected") {
    intercept[IllegalArgumentException](CronParser.nextRun("61", t0))
    intercept[IllegalArgumentException](CronParser.nextRun("*/0", t0))
    intercept[NumberFormatException](CronParser.nextRun("abc", t0))
  }

  test("property: result is strictly future, second-aligned, matching") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val m = rnd.nextInt(3) match {
        case 0 => "*"
        case 1 => s"*/${rnd.nextInt(59) + 1}"
        case _ => rnd.nextInt(60).toString
      }
      val from = Instant.ofEpochSecond(math.abs(rnd.nextLong() % 4102444800L))
      val next = CronParser.nextRun(m, from)
      assert(next.isAfter(from), s"$m from $from")
      assert(next.getEpochSecond % 60 == 0, s"$m from $from")
      val minute = java.time.ZonedDateTime
        .ofInstant(next, java.time.ZoneOffset.UTC).getMinute
      assert(CronParser.parseField(m, 59).matches(minute), s"$m from $from")
      // minute-granularity: never skips more than the worst-case gap
      assert(next.getEpochSecond - from.getEpochSecond <= 3660, s"$m from $from")
    }
  }
}
