package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen formulations of the shingle/MinHash front end shared
  * by every band-based dedup/graph query (the hot per-row projection of
  * [[graft.ops.Dedup.bandsForDocs]] / `withShingles`).
  *
  * The declarative shapes they replace — two `zip_with` passes + a
  * `filter` + `array_distinct` for the shingles, then per digest a
  * `transform(md5)` materializing a 32-char hex string per shingle plus
  * six `array_min(transform(substring))` folds — are all higher-order
  * functions, which evaluate interpreted (CodegenFallback) and break
  * whole-stage codegen at the first operator of every scan that feeds a
  * band join (the same failure mode the r17 native `Quantize1e4` fixed
  * for the vector scans). Here each row is one fused loop over the raw
  * UTF-8 word bytes: shingle strings are fed to the digest as
  * (word, ' ', word, ' ', word) update calls without ever concatenating
  * them, digests stay 16 raw bytes (no hex strings), and the six minima
  * are tracked as unsigned 32-bit ints — lexicographic min over
  * lowercase fixed-width hex IS numeric min over the big-endian chunk
  * value, so formatting happens once per row, not once per shingle.
  *
  * Differential specs pin both against the retained HOF references
  * across normal/short/null/duplicate/unicode regimes
  * (MinHashNativeSpec), and the DuckDB oracle cross-checks every
  * band-based gate row end to end.
  */
object MinHashShingles {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val Pre1 = Array[Byte]('1'.toByte, ':'.toByte)
  private val Pre2 = Array[Byte]('2'.toByte, ':'.toByte)
  private val Space = ' '.toByte

  /** Distinct 3-gram shingles in first-occurrence order — exactly
    * `array_distinct(filter(zip_with-chain, notNull))`: shingle i =
    * words(i)+" "+words(i+1)+" "+words(i+2); windows containing a null
    * word are skipped (the HOF chain's concat-null-then-filter).
    * Never null for a non-null input (short inputs yield the empty
    * array, as the zip_with chain does).
    */
  def shingles3(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + 2 < n) {
      if (!arr.isNullAt(i) && !arr.isNullAt(i + 1) && !arr.isNullAt(i + 2)) {
        val sp = UTF8String.fromBytes(Array(Space))
        seen.add(UTF8String.concat(arr.getUTF8String(i), sp,
          arr.getUTF8String(i + 1), sp, arr.getUTF8String(i + 2)))
      }
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** The six 8-hex-char MinHash chunk minima over the 3-gram shingle
    * multiset (duplicates cannot move a min, so no distinct pass):
    * element i (1-based) = `min over shingles of substr(md5(prefix:shingle),
    * off(i), 8)` with (prefix, off) = ((i−1)/4+1, ((i−1)%4)·8+1) — the
    * exact [[graft.ops.Dedup.bandsForDocs]] signature layout (h1..h4
    * from digest "1:", h5..h6 from digest "2:"). Returns NULL when the
    * shingle set is empty (the array_min-over-empty null the band keys
    * propagate).
    */
  def minhash6(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 3) return null
    val words = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      words(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val md = mdLocal.get()
    val mins = Array.fill(6)(0xFFFFFFFFL + 1L) // above any unsigned 32-bit chunk
    var processed = false
    i = 0
    while (i + 2 < n) {
      if (words(i) != null && words(i + 1) != null && words(i + 2) != null) {
        processed = true
        var d = 0
        while (d < 2) {
          md.update(if (d == 0) Pre1 else Pre2)
          md.update(words(i)); md.update(Space)
          md.update(words(i + 1)); md.update(Space)
          md.update(words(i + 2))
          val dig = md.digest() // digest() resets the instance
          val lim = if (d == 0) 4 else 2
          var c = 0
          while (c < lim) {
            val v = ((dig(4 * c) & 0xFFL) << 24) | ((dig(4 * c + 1) & 0xFFL) << 16) |
              ((dig(4 * c + 2) & 0xFFL) << 8) | (dig(4 * c + 3) & 0xFFL)
            val idx = if (d == 0) c else 4 + c
            if (v < mins(idx)) mins(idx) = v
            c += 1
          }
          d += 1
        }
      }
      i += 1
    }
    if (!processed) return null
    val out = new Array[Any](6)
    var j = 0
    while (j < 6) {
      out(j) = UTF8String.fromString(f"${mins(j)}%08x")
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `shingles3(ARRAY<STRING> words)` — see [[MinHashShingles.shingles3]]. */
case class Shingles3(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles3"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(words: Any): Any =
    MinHashShingles.shingles3(words.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashShingles.shingles3($a);")

  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)
}

/** `minhash6(ARRAY<STRING> words)` — see [[MinHashShingles.minhash6]].
  * Nullable even for non-null input: a shingle-less document has no
  * minima (the band keys built from the null result stay null and fall
  * out of every band join, exactly as the HOF formulation's
  * array_min-over-empty did).
  */
case class MinHash6(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash6"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(words: Any): Any =
    MinHashShingles.minhash6(words.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.MinHashShingles.minhash6($a);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MinHash6 =
    copy(child = newChild)
}
