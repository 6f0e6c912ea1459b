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
    intercept[IllegalArgumentException](CronParser.nextRun("abc", t0))
    intercept[IllegalArgumentException](CronParser.nextRun("0 0 0 * *", t0)) // dom min 1
    intercept[IllegalArgumentException](CronParser.nextRun("0 0 1 13 *", t0)) // month max 12
    intercept[IllegalArgumentException](CronParser.nextRun("0 0 1 1 7", t0)) // dow max 6
    intercept[IllegalArgumentException](CronParser.nextRun("0 0 1", t0)) // 3 fields
  }

  test("day-of-month: monthly run rolls into next month") {
    // t0 is Jan 15 → "0 0 1 * *" = midnight on the 1st → Feb 1
    assert(CronParser.nextRun("0 0 1 * *", t0) == Instant.parse("2026-02-01T00:00:00Z"))
  }

  test("month: yearly run in a fixed month") {
    // 10:00 on March 5th, from Jan 15 → Mar 5 this year; from Apr → next year
    assert(CronParser.nextRun("0 10 5 3 *", t0) == Instant.parse("2026-03-05T10:00:00Z"))
    val fromApril = Instant.parse("2026-04-01T00:00:00Z")
    assert(CronParser.nextRun("0 10 5 3 *", fromApril) == Instant.parse("2027-03-05T10:00:00Z"))
  }

  test("day-of-week: weekly run on Sunday=0") {
    // 2026-01-15 is a Thursday; next Sunday is Jan 18
    assert(CronParser.nextRun("30 8 * * 0", t0) == Instant.parse("2026-01-18T08:30:00Z"))
    // Thursday=4 later the same day
    assert(CronParser.nextRun("0 23 * * 4", t0) == Instant.parse("2026-01-15T23:00:00Z"))
  }

  test("dom+dow conjunction (no POSIX OR quirk)") {
    // Friday the 13th: first after 2026-01-15 is 2026-02-13
    assert(CronParser.nextRun("0 0 13 * 5", t0) == Instant.parse("2026-02-13T00:00:00Z"))
  }

  test("leap day matches and unsatisfiable dates are rejected") {
    assert(CronParser.nextRun("0 0 29 2 *", t0) == Instant.parse("2028-02-29T00:00:00Z"))
    intercept[IllegalArgumentException](CronParser.nextRun("0 0 30 2 *", t0))
  }

  test("lists and ranges in every field") {
    // minute list: next of {10, 40} after 10:23 is 10:40
    assert(CronParser.nextRun("10,40 * * * *", t0) == Instant.parse("2026-01-15T10:40:00Z"))
    // minute range: 20-25 after :23 → :24
    assert(CronParser.nextRun("20-25 * * * *", t0) == Instant.parse("2026-01-15T10:24:00Z"))
    // range with step: 0-59/20 → {0,20,40}
    assert(CronParser.nextRun("0-59/20 * * * *", t0) == Instant.parse("2026-01-15T10:40:00Z"))
    // hour range: business hours tomorrow morning (already past 9-11 window? 10:23 is inside → next minute)
    assert(CronParser.nextRun("0 9-11 * * *", t0) == Instant.parse("2026-01-15T11:00:00Z"))
    // dom list: 1st and 20th
    assert(CronParser.nextRun("0 0 1,20 * *", t0) == Instant.parse("2026-01-20T00:00:00Z"))
    // month range: Jan 15 10:23 is inside Jan-Mar at minute 0 hour 0 → next midnight
    assert(CronParser.nextRun("0 0 * 1-3 *", t0) == Instant.parse("2026-01-16T00:00:00Z"))
    // dow list: weekend (Sat=6, Sun=0); Jan 15 is Thursday → Sat Jan 17
    assert(CronParser.nextRun("0 0 * * 0,6", t0) == Instant.parse("2026-01-17T00:00:00Z"))
    // mixed list of atoms: value, range, range/step
    assert(CronParser.nextRun("5,30-35,50-58/4 * * * *", t0) == Instant.parse("2026-01-15T10:30:00Z"))
  }

  test("list/range validation") {
    intercept[IllegalArgumentException](CronParser.nextRun("5-70 * * * *", t0)) // out of bounds
    intercept[IllegalArgumentException](CronParser.nextRun("40-20 * * * *", t0)) // inverted
    intercept[IllegalArgumentException](CronParser.nextRun("1,,3 * * * *", t0)) // empty atom
    intercept[IllegalArgumentException](CronParser.nextRun("1,* * * * *", t0)) // star in list
    intercept[IllegalArgumentException](CronParser.nextRun("0 0 1 1 0-7", t0)) // dow max 6
  }

  test("property: list/range fields produce strictly-future matching results") {
    val rnd = new scala.util.Random(21)
    (1 to 200).foreach { _ =>
      def atom(max: Int, min: Int): String = rnd.nextInt(3) match {
        case 0 => (min + rnd.nextInt(max - min + 1)).toString
        case 1 =>
          val a = min + rnd.nextInt(max - min)
          val b = a + 1 + rnd.nextInt(max - a)
          s"$a-$b"
        case _ =>
          val a = min + rnd.nextInt(max - min)
          val b = a + 1 + rnd.nextInt(max - a)
          s"$a-$b/${1 + rnd.nextInt(5)}"
      }
      def field(max: Int, min: Int): String =
        (1 to 1 + rnd.nextInt(3)).map(_ => atom(max, min)).mkString(",")
      // dom capped at 28 so the spec is always satisfiable
      val expr = s"${field(59, 0)} ${field(23, 0)} ${field(28, 1)} ${field(12, 1)} ${field(6, 0)}"
      val from = Instant.ofEpochSecond(math.abs(rnd.nextLong() % 4102444800L))
      val next = CronParser.nextRun(expr, from)
      val z = java.time.ZonedDateTime.ofInstant(next, java.time.ZoneOffset.UTC)
      val spec = CronParser.parse(expr)
      assert(next.isAfter(from), s"$expr from $from")
      assert(spec.timeMatches(z) && spec.dateMatches(z), s"$expr from $from → $next")
    }
  }

  test("Feb-29 weekday conjunction across the 2100 skipped leap year") {
    // Feb 29 2076 is a Saturday; the NEXT Saturday Feb 29 is 2116 — a
    // 40-year gap across the non-leap 2100 (the case the old 29-year
    // day guard wrongly rejected as never-matching)
    val after2076 = Instant.parse("2076-03-01T00:00:00Z")
    assert(CronParser.nextRun("0 0 29 2 6", after2076) ==
      Instant.parse("2116-02-29T00:00:00Z"))
  }

  test("property: 5-field results match every field and are strictly future") {
    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      def pick(max: Int, min: Int): String = rnd.nextInt(3) match {
        case 0 => "*"
        case 1 => s"*/${rnd.nextInt(max - 1) + 1}"
        case _ => (min + rnd.nextInt(max - min + 1)).toString
      }
      // dom capped at 28 so the spec is always satisfiable
      val expr = s"${pick(59, 0)} ${pick(23, 0)} ${pick(28, 1)} ${pick(12, 1)} ${pick(6, 0)}"
      val from = Instant.ofEpochSecond(math.abs(rnd.nextLong() % 4102444800L))
      val next = CronParser.nextRun(expr, from)
      assert(next.isAfter(from), s"$expr from $from")
      assert(next.getEpochSecond % 60 == 0, s"$expr from $from")
      val z = java.time.ZonedDateTime.ofInstant(next, java.time.ZoneOffset.UTC)
      val spec = CronParser.parse(expr)
      assert(spec.timeMatches(z) && spec.dateMatches(z), s"$expr from $from → $next")
    }
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
