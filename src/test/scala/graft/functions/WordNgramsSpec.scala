package graft.functions

import graft.SparkSpec
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

/** Differential pin for the native sliding word n-grams
  * ([[WordNgramsExpr]] behind `TextAnalysis.wordNgrams`/`wordBigrams`):
  * the fused codegen expression must reproduce the retained HOF
  * references exactly —
  *
  *  - n = 2: `TextAnalysis.wordBigramsRef` (zip_with + concat + filter,
  *    what every bigram row shipped through r17), values AND order,
  *    INCLUDING null-bearing arrays (both drop windows containing a
  *    null word);
  *  - n = 5: the dup_ngram CASE WHEN / transform / array_join shape,
  *    on split()-derived input — the only input the call site can see,
  *    and the one regime where the two HOF shapes themselves agree
  *    (array_join SKIPS a null word inside a window; the zip_with
  *    chain and the native drop the window — distinguishable only by
  *    null ELEMENTS, which split() never produces).
  */
class WordNgramsSpec extends SparkSpec {
  import spark.implicits._

  private val texts: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "a b",                          // exactly one bigram, no 5-gram
    3L -> "",                             // split("") = [""] → 1 word
    4L -> "solo",                         // 1 word → no grams at any n
    5L -> "a a a a a a",                  // repeated grams KEPT (counts)
    6L -> "héllo wörld æøå üî ßharp",     // multi-byte UTF-8
    7L -> "a  b   c d",                   // consecutive spaces → empty words
    8L -> "w1 w2 w3 w4 w5",               // exactly one 5-gram
    9L -> null,                           // null text
    10L -> "x y z p q r s t u v w")

  private def corpus = texts.toDF("doc_id", "text")

  private val ngram5Ref =
    expr("""CASE WHEN size(ws) >= 5
      |  THEN transform(sequence(1, size(ws) - 4), i -> array_join(slice(ws, i, 5), ' '))
      |  ELSE array() END""".stripMargin)

  test("native bigrams == HOF reference (values and order), all text regimes") {
    val rows = corpus.withColumn("ws", split($"text", " "))
      .select($"doc_id",
        TextAnalysis.wordNgrams($"ws", 2).as("native"),
        TextAnalysis.wordBigramsRef($"ws").as("ref"))
      .orderBy($"doc_id").collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"doc ${r.get(0)}: native ${r.get(1)} != reference ${r.get(2)}")
    }
  }

  test("native bigrams drop null-bearing windows exactly like the zip_with chain") {
    val arrs: Seq[(Long, Seq[String])] = Seq(
      1L -> Seq("a", null, "b", "c"),     // windows (a,null),(null,b) drop
      2L -> Seq(null, null),              // all windows drop → empty
      3L -> Seq("x", "y", null),          // (x,y) survives, (y,null) drops
      4L -> Seq(null))                    // single elem → empty
    val rows = arrs.toDF("id", "ws")
      .select($"id",
        TextAnalysis.wordNgrams($"ws", 2).as("native"),
        TextAnalysis.wordBigramsRef($"ws").as("ref"))
      .orderBy($"id").collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"arr ${r.get(0)}: native ${r.get(1)} != reference ${r.get(2)}")
    }
  }

  test("native 5-grams == dup_ngram HOF reference on split input, all regimes") {
    // compared POST-explode — the only consumption shape the call site
    // has. (Pre-explode the two differ exactly on null input: the
    // native null-propagates like every UnaryExpression, the CASE WHEN
    // reference yields array(); explode maps both to zero rows.)
    def exploded(g: org.apache.spark.sql.Column) =
      corpus.withColumn("ws", split($"text", " "))
        .select($"doc_id", explode(g).as("g"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(exploded(TextAnalysis.wordNgrams($"ws", 5)) == exploded(ngram5Ref))
  }

  test("random word-soup sweep: n=2 and n=5 match the references") {
    val rnd = new scala.util.Random(182)
    val pool = Vector("alpha", "beta", "gamma", "delta", "x", "yy", "zzz",
      "ému", "", "WORD", "w0rd")
    val docs = (0L until 300L).map { i =>
      val n = rnd.nextInt(14)
      i -> (0 until n).map(_ => pool(rnd.nextInt(pool.size))).mkString(" ")
    }
    val rows = docs.toDF("doc_id", "text")
      .withColumn("ws", split($"text", " "))
      .select($"doc_id",
        TextAnalysis.wordNgrams($"ws", 2).as("n2"),
        TextAnalysis.wordBigramsRef($"ws").as("r2"),
        TextAnalysis.wordNgrams($"ws", 5).as("n5"),
        ngram5Ref.as("r5"))
      .collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2), s"doc ${r.get(0)} bigrams diverge")
      assert(r.get(3) == r.get(4), s"doc ${r.get(0)} 5-grams diverge")
    }
  }

  test("the gram scan stays inside whole-stage codegen (no CodegenFallback HOF)") {
    val plan = corpus.withColumn("ws", split($"text", " "))
      .select($"doc_id", explode(TextAnalysis.wordNgrams($"ws", 2)).as("bg"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("word_ngrams"), s"native expression missing:\n$plan")
    // executedPlan.toString marks whole-stage-codegen membership with
    // the *(n) prefix; the HOF chain it replaces printed an unstarred
    // Generate over a CodegenFallback projection
    assert(plan.contains("*(1) Generate explode(word_ngrams"),
      s"expected the gram Generate inside codegen stage 1:\n$plan")
  }
}
