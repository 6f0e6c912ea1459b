package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.{call_function, col}

/** [[DamerauLevenshtein]]: variant pinning (unrestricted Lowrance–
  * Wagner, DuckDB's `damerau_levenshtein` twin) and the codegen path.
  */
class DamerauSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  private def dl(a: String, b: String): Int =
    Seq((a, b)).toDF("a", "b")
      .select(call_function("damerau_lev", col("a"), col("b")))
      .as[Int].head()

  test("matches the unrestricted-variant reference values") {
    // CA→ABC=2 is THE discriminator: restricted/OSA answers 3 (the
    // transposed pair may not be edited again), unrestricted answers 2
    // (delete B from between the transposed A,C) — DuckDB answers 2
    assert(dl("CA", "ABC") == 2)
    assert(dl("ab", "ba") == 1)          // one transposition
    assert(dl("specter", "spectre") == 1)
    assert(dl("kitten", "sitting") == 3) // no transpositions: = levenshtein
    assert(dl("abcdef", "abcfed") == 2)
    assert(dl("", "abc") == 3 && dl("abc", "") == 3 && dl("", "") == 0)
    assert(dl("same", "same") == 0)
  }

  test("transposition costs 1 where levenshtein pays 2, never more than levenshtein") {
    val pairs = Seq(("the quick fox", "the quick fxo"), ("hola", "ohla"),
      ("data", "dtaa"), ("abc", "xyz"))
    for ((a, b) <- pairs) {
      val lev = Seq((a, b)).toDF("a", "b")
        .select(org.apache.spark.sql.functions.levenshtein(col("a"), col("b")))
        .as[Int].head()
      assert(dl(a, b) <= lev, s"($a, $b)")
    }
    assert(dl("the quick fox", "the quick fxo") == 1)
  }

  test("interpreted eval equals the codegen result") {
    // WholeStageCodegen evaluates the expression in generated Java; the
    // literal-fold path evaluates interpreted — both must agree
    val rows = Seq(("CA", "ABC"), ("ab", "ba"), ("flaw", "lawn"))
    val fromDf = rows.toDF("a", "b")
      .select(call_function("damerau_lev", col("a"), col("b"))).as[Int].collect().toSeq
    val direct = rows.map { case (a, b) =>
      DamerauImpl.distance(
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b))
    }
    assert(fromDf == direct)
  }

  test("supplementary-plane text counts code points, not UTF-16 units") {
    // each emoji is one code point but two UTF-16 chars; a swapped
    // adjacent pair must be ONE transposition (char-level DP saw four
    // units and answered 2), matching DuckDB's code-point semantics
    val dl = (a: String, b: String) =>
      Seq((a, b)).toDF("a", "b")
        .select(call_function("damerau_lev", col("a"), col("b"))).as[Int].head()
    assert(dl("😀😁", "😁😀") == 1)
    // substitution of one supplementary code point = 1 edit (not 2)
    assert(dl("x😀y", "x😁y") == 1)
    // and the banded-prefilter invariant lev <= 2*dl holds in the same
    // alphabet: Spark's levenshtein counts code points too
    val lev = Seq(("😀😁", "😁😀"))
      .toDF("a", "b").select(org.apache.spark.sql.functions.levenshtein(col("a"), col("b"))).as[Int].head()
    assert(lev <= 2 * 1)
  }

  test("nulls propagate as null") {
    val out = Seq((Some("a"), None: Option[String]))
      .toDF("a", "b")
      .select(call_function("damerau_lev", col("a"), col("b")))
      .collect()
    assert(out.head.isNullAt(0))
  }
}
