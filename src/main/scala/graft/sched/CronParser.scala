package graft.sched

import java.time.{Instant, ZoneOffset, ZonedDateTime}

/** Cron next-run computation. The reference parses 5 fields but honors
  * only the minute field with exactly three cases — star, step ("star
  * slash N"), fixed M (scheduler/cron_parser.py:4-42; hour/day/month/
  * weekday parsed and ignored). We keep those semantics for the minute
  * field and honor the hour field too (same 3 cases) — a strict
  * superset, pure function, property-tested.
  */
object CronParser {

  sealed trait FieldSpec {
    def matches(v: Int): Boolean
  }
  case object Any extends FieldSpec { def matches(v: Int) = true }
  final case class EveryN(n: Int) extends FieldSpec { def matches(v: Int) = v % n == 0 }
  final case class Fixed(m: Int) extends FieldSpec { def matches(v: Int) = v == m }

  def parseField(s: String, max: Int): FieldSpec = s match {
    case "*" => Any
    case step if step.startsWith("*/") =>
      val n = step.drop(2).toInt
      require(n > 0 && n <= max, s"step out of range: $s")
      EveryN(n)
    case fixed =>
      val m = fixed.toInt
      require(m >= 0 && m <= max, s"value out of range: $s")
      Fixed(m)
  }

  final case class Spec(minute: FieldSpec, hour: FieldSpec)

  /** Parse "m h dom mon dow" (1, 2 or 5 fields; beyond hour ignored,
    * like the reference ignores everything beyond minute).
    */
  def parse(expr: String): Spec = {
    val parts = expr.trim.split("\\s+")
    require(parts.nonEmpty && parts.length <= 5, s"bad cron '$expr'")
    val minute = parseField(parts(0), 59)
    val hour = if (parts.length > 1) parseField(parts(1), 23) else Any
    Spec(minute, hour)
  }

  /** Next instant strictly after `from` whose (minute, hour) match —
    * minute granularity, seconds zeroed (≅ cron_parser.py:12-13 basing
    * off now+1min with seconds stripped).
    */
  def nextRun(expr: String, from: Instant): Instant = {
    val spec = parse(expr)
    var t = ZonedDateTime.ofInstant(from, ZoneOffset.UTC)
      .withSecond(0).withNano(0).plusMinutes(1)
    var guard = 0
    while (!(spec.minute.matches(t.getMinute) && spec.hour.matches(t.getHour))) {
      t = t.plusMinutes(1)
      guard += 1
      require(guard <= 24 * 60, s"cron '$expr' never matches")
    }
    t.toInstant
  }
}
