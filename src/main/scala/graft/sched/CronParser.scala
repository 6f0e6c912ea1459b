package graft.sched

import java.time.{Instant, ZoneOffset, ZonedDateTime}

/** Cron next-run computation. The reference parses 5 fields but honors
  * only the minute field with exactly three cases — star, step ("star
  * slash N"), fixed M (scheduler/cron_parser.py:4-42; hour/day/month/
  * weekday parsed and ignored). We keep those per-field cases, add
  * standard lists and ranges ("1,3,5", "1-5", "10-40/5"), and honor
  * ALL FIVE fields — a strict superset, pure function, property-tested.
  * All fields are conjunctive (no POSIX dom/dow OR quirk); weekday
  * 0 = Sunday. Bare-step semantics are `value % N == 0` for every
  * field, matching the reference's minute-step behavior.
  */
object CronParser {

  sealed trait FieldSpec {
    def matches(v: Int): Boolean
  }
  case object Any extends FieldSpec { def matches(v: Int) = true }
  final case class EveryN(n: Int) extends FieldSpec { def matches(v: Int) = v % n == 0 }
  final case class Fixed(m: Int) extends FieldSpec { def matches(v: Int) = v == m }
  /** Lists and ranges ("1,3,5", "1-5", "10-40/5", or mixes) expand to an
    * explicit value set at parse time — the value domains are tiny
    * (≤ 60), so set membership is the whole match. Range-with-step uses
    * standard cron offset-from-lo semantics (a, a+n, …, ≤ b); the bare
    * "*&#47;n" form keeps the reference's `v % n == 0` semantics
    * unchanged (scheduler/cron_parser.py:22-28).
    */
  final case class OneOf(values: Set[Int]) extends FieldSpec {
    def matches(v: Int) = values.contains(v)
  }

  private val rangeStep = """(\d+)-(\d+)(?:/(\d+))?""".r

  /** One error contract for every malformed field: non-numeric atoms
    * ("1,,3", "1,*", "a-b") fail via require with the field text, same
    * as out-of-range values, never via NumberFormatException.
    */
  private def atomToInt(atom: String, field: String): Int = {
    require(atom.nonEmpty && atom.forall(_.isDigit), s"bad cron atom in: $field")
    atom.toInt
  }

  def parseField(s: String, max: Int, min: Int = 0): FieldSpec = s match {
    case "*" => Any
    case step if step.startsWith("*/") =>
      val n = atomToInt(step.drop(2), s)
      require(n > 0 && n <= max, s"step out of range: $s")
      EveryN(n)
    case listOrRange if listOrRange.contains(",") || listOrRange.contains("-") =>
      val values = listOrRange.split(",", -1).toIndexedSeq.flatMap {
        case rangeStep(lo, hi, st) =>
          val step = Option(st).map(_.toInt).getOrElse(1)
          val (l, h) = (lo.toInt, hi.toInt)
          require(step > 0, s"step out of range: $s")
          require(l >= min && h <= max && l <= h, s"range out of bounds: $s")
          l to h by step
        case atom =>
          val v = atomToInt(atom, s)
          require(v >= min && v <= max, s"value out of range: $s")
          Seq(v)
      }
      OneOf(values.toSet)
    case fixed =>
      val m = atomToInt(fixed, s)
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
    * whole (jump to next midnight), so the scan is O(days + 1440). The
    * day guard must cover the worst satisfiable gap before declaring a
    * spec unsatisfiable (e.g. "0 0 30 2 *"): for a (Feb 29,
    * fixed-weekday) conjunction the usual 28-year Gregorian cycle
    * breaks across skipped century leap years — Feb 29 on a given
    * weekday can be 40 years apart around 2100 (2076 → 2116 for a
    * Saturday, the case CronParserSpec pins) — so the guard is 41
    * years of days.
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
        require(dayGuard <= 41 * 366, s"cron '$expr' never matches")
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
