package graft.ops

import graft.SparkSpec

/** Function-level PII-scrub checks on realistic variants — the catalog
  * row (q_text_pii) gate-checks one planted form against DuckDB; this
  * covers the match breadth (subdomains, +tags, country codes) and the
  * no-PII identity case.
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("scrubPii redacts email/phone variants and counts per category") {
    val rows = Seq(
      (1L, "mail a.b_c%d+tag@sub.example.co.uk and +44-020-7946 done"),
      (2L, "two mails x@y.io z@w.dev one phone +1-555-0100"),
      (3L, "no pii here at all"),
      (4L, "ALMOST@pii (uppercase local part not matched) and +1-55-01")) // wrong shapes
      .toDF("doc_id", "text")
    val out = TextAnalysis.scrubPii(rows, "text")
      .select($"doc_id", $"n_emails", $"n_phones", $"clean")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((1L, 1L, "mail <EMAIL> and <PHONE> done")))
    assert(out(2L) == ((2L, 1L, "two mails <EMAIL> <EMAIL> one phone <PHONE>")))
    assert(out(3L) == ((0L, 0L, "no pii here at all")))
    // the lowercase-only email class must not match an uppercase local
    // part, and a malformed phone must survive — redaction is precise,
    // not greedy
    assert(out(4L)._1 == 0L && out(4L)._2 == 0L)
    assert(out(4L)._3.contains("ALMOST@pii") && out(4L)._3.contains("+1-55-01"))
  }
}
