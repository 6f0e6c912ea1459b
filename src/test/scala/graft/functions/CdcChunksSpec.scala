package graft.functions

import graft.SparkSpec
import graft.ops.TextAnalysis

/** Differential pin: the native [[CdcChunks]] expression path
  * (`TextAnalysis.cdcChunkSigs`) must produce the same
  * (doc_id, chunk_id, sig, n_tokens) row set as the retained
  * window/aggregation reference across boundary-rich text, short docs,
  * empty strings, unicode, and a random sweep — plus the shift-
  * robustness property the chunker exists for.
  */
class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  private def diff(rows: Seq[(Long, String)]): Unit = {
    val docs = rows.toDF("doc_id", "text")
    val native = TextAnalysis.cdcChunkSigs(docs)
      .orderBy($"doc_id", $"chunk_id").collect().toSeq
    val ref = TextAnalysis.cdcChunkSigsReference(docs)
      .orderBy($"doc_id", $"chunk_id").collect().toSeq
    assert(native == ref, s"chunker diverged:\nnative: $native\nref:    $ref")
  }

  test("native == reference on fixed regimes") {
    diff(Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "a",
      3L -> "a b",
      4L -> "",
      5L -> "héllo wörld æøå üî ßharp énd",
      6L -> ("tok " * 200).trim,
      7L -> null.asInstanceOf[String]))
  }

  test("native == reference on a random sweep") {
    val rnd = new scala.util.Random(59)
    val pool = Vector("alpha", "beta", "gamma", "delta", "x", "yy", "zzz", "é")
    diff((0L until 200L).map { i =>
      val n = rnd.nextInt(40)
      (i, (0 until n).map(_ => pool(rnd.nextInt(pool.size))).mkString(" "))
    })
  }

  test("shift robustness: an early edit re-chunks only its neighborhood") {
    val base = (1 to 120).map(i => s"w$i").mkString(" ")
    val edited = "inserted " + base
    val sigsOf = (t: String) => TextAnalysis.cdcChunkSigs(
      Seq((1L, t)).toDF("doc_id", "text"))
      .select($"sig").as[String].collect().toSet
    val a = sigsOf(base)
    val b = sigsOf(edited)
    // the tail chunks keep their signatures — only the edit's
    // neighborhood changes
    assert((a intersect b).nonEmpty, "no shared chunk after a one-word edit")
  }
}
