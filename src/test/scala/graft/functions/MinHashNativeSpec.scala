package graft.functions

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Differential pin for the native shingle/MinHash front end: the fused
  * codegen expressions ([[Shingles3]], [[MinHash6]] inside
  * `Dedup.bandsForDocs`) must reproduce the retained HOF references
  * (`Dedup.shinglesFromWords`, `Dedup.bandsForDocsReference`) exactly —
  * values AND element order for the shingles, (doc_id, band, key) row
  * sets for the band table — across normal text, short docs (< 3
  * words), empty strings, duplicate shingles, consecutive spaces (empty
  * words), unicode, and null text. The references are what shipped
  * through r17 and what the DuckDB oracle CTEs mirror; the natives are
  * mechanical rewrites for whole-stage codegen.
  */
class MinHashNativeSpec extends SparkSpec {
  import spark.implicits._

  private val regimes: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "a b",                          // < 3 words → no shingles
    3L -> "",                             // split("") = [""] → 1 word
    4L -> "x y z",                        // exactly one shingle
    5L -> "a a a a a a",                  // one distinct shingle, repeated
    6L -> "héllo wörld æøå üî ßharp",     // multi-byte UTF-8
    7L -> "a  b   c d",                   // consecutive spaces → empty words
    8L -> "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10",
    9L -> null,                           // null text
    10L -> "repeat me repeat me repeat me repeat me")

  private def corpus = regimes.toDF("doc_id", "text")

  test("native shingles3 == HOF reference (values and order), all regimes") {
    val rows = corpus.select($"doc_id",
      Dedup.shingles3(split($"text", " ")).as("native"),
      Dedup.shinglesFromWords(split($"text", " ")).as("ref"))
      .orderBy($"doc_id").collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"doc ${r.get(0)}: native ${r.get(1)} != reference ${r.get(2)}")
    }
  }

  test("native band table == HOF reference band table, all regimes") {
    val native = Dedup.bandsForDocs(corpus)
      .orderBy($"doc_id", $"band").collect().toSeq
    val ref = Dedup.bandsForDocsReference(corpus)
      .orderBy($"doc_id", $"band").collect().toSeq
    assert(native == ref,
      s"band tables diverge:\nnative: $native\nref:    $ref")
  }

  test("random word-soup sweep: shingles and bands match the references") {
    val rnd = new scala.util.Random(41)
    val pool = Vector("alpha", "beta", "gamma", "delta", "x", "yy", "zzz",
      "ému", "", "WORD", "w0rd")
    val docs = (0L until 300L).map { i =>
      val n = rnd.nextInt(12)
      val text = (0 until n).map(_ => pool(rnd.nextInt(pool.size))).mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
    val sh = docs.select($"doc_id",
      Dedup.shingles3(split($"text", " ")).as("native"),
      Dedup.shinglesFromWords(split($"text", " ")).as("ref")).collect()
    sh.foreach(r => assert(r.get(1) == r.get(2), s"doc ${r.get(0)} shingles diverge"))
    val native = Dedup.bandsForDocs(docs).orderBy($"doc_id", $"band", $"key").collect().toSeq
    val ref = Dedup.bandsForDocsReference(docs).orderBy($"doc_id", $"band", $"key").collect().toSeq
    assert(native == ref, "band tables diverge on the random sweep")
  }

  test("the shipped paths really are the native expressions (no HOF in the plan)") {
    val bandPlan = Dedup.bandsForDocs(corpus).queryExecution.analyzed.toString
    assert(bandPlan.contains("minhash6"), s"minhash6 missing:\n$bandPlan")
    assert(!bandPlan.contains("array_min"), s"HOF minima leaked into the shipped band path:\n$bandPlan")
    val shPlan = corpus.select(Dedup.shingles3(split($"text", " ")))
      .queryExecution.analyzed.toString
    assert(shPlan.contains("shingles3"), s"shingles3 missing:\n$shPlan")
    assert(!shPlan.contains("zip_with"), s"HOF chain leaked into the shipped shingle path:\n$shPlan")
  }
}
