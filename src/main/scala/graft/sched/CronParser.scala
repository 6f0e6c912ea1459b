package graft.sched

import java.time.{Instant, ZoneOffset, ZonedDateTime}

/** Cron next-run computation. The reference parses 5 fields but honors
  * only the minute field with exactly three cases — star, step ("star
  * slash N"), fixed M (scheduler/cron_parser.py:4-42; hour/day/month/
  * weekday parsed and ignored). We keep those three per-field cases and
  * honor ALL FIVE fields — a strict superset, pure function,
  * property-tested. All fields are conjunctive (no POSIX dom/dow OR
  * quirk); weekday 0 = Sunday. Step semantics are `value % N == 0` for
  * every field, matching the reference's minute-step behavior.
  */
object CronParser {

  sealed trait FieldSpec {
    def matches(v: Int): Boolean
  }
  case object Any extends FieldSpec { def matches(v: Int) = true }
  final case class EveryN(n: Int) extends FieldSpec { def matches(v: Int) = v % n == 0 }
  final case class Fixed(m: Int) extends FieldSpec { def matches(v: Int) = v == m }

  def parseField(s: String, max: Int, min: Int = 0): FieldSpec = s match {
    case "*" => Any
    case step if step.startsWith("*/") =>
      val n = step.drop(2).toInt
      require(n > 0 && n <= max, s"step out of range: $s")
      EveryN(n)
    case fixed =>
      val m = fixed.toInt
      require(m >= min && m <= max, s"value out of range: $s")
      Fixed(m)
  }

  final case class Spec(
      minute: FieldSpec, hour: FieldSpec,
      dayOfMonth: FieldSpec = Any, month: FieldSpec = Any, dayOfWeek: FieldSpec = Any) {
    def dateMatches(t: ZonedDateTime): Boolean =
      dayOfMonth.matches(t.getDayOfMonth) && month.matches(t.getMonthValue) &&
        dayOfWeek.matches(t.getDayOfWeek.getValue % 7) // java Mon=1..Sun=7 → cron Sun=0
    def timeMatches(t: ZonedDateTime): Boolean =
      minute.matches(t.getMinute) && hour.matches(t.getHour)
  }

  /** Parse "m h dom mon dow" (1, 2 or 5 fields — same arities the
    * reference accepts; with fewer fields the rest default to `*`).
    */
  def parse(expr: String): Spec = {
    val parts = expr.trim.split("\\s+")
    require(parts.length == 1 || parts.length == 2 || parts.length == 5,
      s"bad cron '$expr'")
    Spec(
      minute = parseField(parts(0), 59),
      hour = if (parts.length > 1) parseField(parts(1), 23) else Any,
      dayOfMonth = if (parts.length > 2) parseField(parts(2), 31, min = 1) else Any,
      month = if (parts.length > 3) parseField(parts(3), 12, min = 1) else Any,
      dayOfWeek = if (parts.length > 4) parseField(parts(4), 6) else Any)
  }

  /** Next instant strictly after `from` matching all five fields —
    * minute granularity, seconds zeroed (≅ cron_parser.py:12-13 basing
    * off now+1min with seconds stripped). Non-matching days are skipped
    * whole (jump to next midnight), so the scan is O(days + 1440);
    * the day guard covers the 28-year worst case of a
    * (Feb 29, fixed-weekday) conjunction before declaring the spec
    * unsatisfiable (e.g. "0 0 30 2 *").
    */
  def nextRun(expr: String, from: Instant): Instant = {
    val spec = parse(expr)
    var t = ZonedDateTime.ofInstant(from, ZoneOffset.UTC)
      .withSecond(0).withNano(0).plusMinutes(1)
    var dayGuard = 0
    while (true) {
      if (!spec.dateMatches(t)) {
        t = t.plusDays(1).withHour(0).withMinute(0)
        dayGuard += 1
        require(dayGuard <= 29 * 366, s"cron '$expr' never matches")
      } else if (!spec.timeMatches(t)) {
        t = t.plusMinutes(1)
        // a new day reached by minute stepping must re-check dateMatches
      } else {
        return t.toInstant
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
