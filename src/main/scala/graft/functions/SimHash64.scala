package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 16-bit SimHash of a word array as a native Catalyst expression with
  * whole-stage codegen — the hot per-row projection of the simhash
  * dedup pipeline. Bit i of the result is set iff the sum over words of
  * ±1 votes is positive, where word w votes +1 on bit i iff hex digit i
  * (0-indexed) of md5(w) is ≥ '8' (equivalently: the high bit of nibble
  * i of the digest is set).
  *
  * Semantically identical to the higher-order-function formulation it
  * replaces (Dedup.simhashFromMd5s over Dedup.wordMd5s, kept for the
  * parity spec): that shape folds a 16-long accumulator with
  * interpreted zip_with/aggregate lambdas (CodegenFallback), burning 16
  * interpreted passes per word digest PLUS materializing every digest
  * as a 32-char hex string. Here the whole row is one fused loop over
  * the raw 16-byte digests — no hex strings, no boxing, no lambda
  * dispatch — inlined into the stage via a static helper call (the md5
  * state lives in a thread-local, so the generated code stays a single
  * primitive-returning call). Null semantics match the HOF fold: null
  * array → null; a null ELEMENT votes −1 on every bit (md5(null) is
  * null and `when(null ≥ '8')` falls to the otherwise(−1) branch).
  * Registered as SQL function `simhash64` by [[GraftExtensions]].
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(words: Any): Any =
    SimHash64.simhashWords(words.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHash64.simhashWords($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** One fused pass: md5 each word's UTF-8 bytes, accumulate the 16
    * ±1 bit votes from the first 8 digest bytes (hex digits 0..15),
    * assemble the fingerprint. Called once per row from the generated
    * code — `MessageDigest.digest` resets the instance, so the
    * thread-local is reusable without explicit reset.
    */
  def simhashWords(arr: ArrayData): Long = {
    val votes = new Array[Int](16)
    val n = arr.numElements()
    var k = 0
    while (k < n) {
      if (arr.isNullAt(k)) {
        // parity with the HOF fold: null digest → otherwise(−1) on all bits
        var j = 0
        while (j < 16) { votes(j) -= 1; j += 1 }
      } else {
        val digest = mdLocal.get().digest(arr.getUTF8String(k).getBytes)
        var j = 0
        while (j < 16) {
          val b = digest(j >> 1)
          // hex digit j ≥ '8' ⇔ high bit of nibble j: even j = high nibble
          val hi = if ((j & 1) == 0) (b >>> 7) & 1 else (b >>> 3) & 1
          votes(j) += (if (hi == 1) 1 else -1)
          j += 1
        }
      }
      k += 1
    }
    var res = 0L
    var j = 0
    while (j < 16) {
      if (votes(j) > 0) res |= 1L << j
      j += 1
    }
    res
  }
}
