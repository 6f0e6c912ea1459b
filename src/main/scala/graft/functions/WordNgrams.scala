package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen sliding word n-grams — the r18 fusion of the bigram /
  * 5-gram front ends of the text-analytics family
  * ([[graft.ops.TextAnalysis.bigramStats]], `repetition`, `lmRarity`,
  * `dsirWeighted`'s token stream, `dupNgramFrac`, and the BPE merge
  * loop's symbol pairs).
  *
  * The declarative shape it replaces — `filter(zip_with(ws, slice(ws,
  * 2, …), concat), notNull)` for bigrams, `transform(sequence(1,
  * size(ws) − (n−1)), i -> array_join(slice(ws, i, n), ' '))` for
  * 5-grams — is a higher-order-function chain, which evaluates
  * interpreted (CodegenFallback) and breaks whole-stage codegen at the
  * first operator of every corpus scan that feeds a gram explode (the
  * same failure mode the native [[MinHashShingles]] pair fixed for the
  * band joins). Here each row is one fused loop over the word array:
  * gram i = words(i)+" "+…+words(i+n−1), duplicates kept in order
  * (counts are occurrences), windows containing a null word skipped —
  * exactly the zip_with chain's concat-null-then-filter semantics. (At
  * the one n=5 call site the HOF reference instead used `array_join`,
  * which SKIPS nulls inside a window rather than dropping the window —
  * indistinguishable there because every caller feeds `split()` output,
  * which never contains null elements; WordNgramsSpec pins both the
  * null-free equivalence and the bigram null-window semantics.)
  *
  * Short inputs (fewer than n words) yield the empty array, as both
  * references do behind their guards. Never null for non-null input.
  */
object WordNgrams {

  private val Space = UTF8String.fromString(" ")

  def ngrams(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[AnyRef](len - n + 1)
    var i = 0
    while (i + n <= len) {
      var ok = true
      var j = 0
      while (ok && j < n) {
        if (arr.isNullAt(i + j)) ok = false
        j += 1
      }
      if (ok) {
        // UTF8String.concat over (word, ' ', word, …) — one allocation
        val parts = new Array[UTF8String](2 * n - 1)
        var k = 0
        while (k < n) {
          parts(2 * k) = arr.getUTF8String(i + k)
          if (k < n - 1) parts(2 * k + 1) = Space
          k += 1
        }
        out.add(UTF8String.concat(parts: _*))
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `word_ngrams(ARRAY<STRING> words, n)` — see [[WordNgrams.ngrams]].
  * `n` must be a foldable positive integer (it parameterizes the fused
  * loop, not the data).
  */
case class WordNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires n >= 1, got $n")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(words: Any): Any =
    WordNgrams.ngrams(words.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WordNgrams.ngrams($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgramsExpr =
    copy(child = newChild)
}
