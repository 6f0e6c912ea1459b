package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking of a word array as ONE native codegen
  * expression — the per-document core of `q_text_cdc_chunks`
  * ([[graft.ops.TextAnalysis.cdcChunkSigs]]).
  *
  * The declarative shape it replaces ran the inherently PER-DOCUMENT
  * computation through cluster machinery: posexplode every token, a
  * doc_id-keyed window (one full exchange + sort of the token table)
  * carrying two lags and a running sum, then a (doc_id, chunk_id)
  * aggregation whose collect_list + array_sort + transform projection is
  * interpreted (HOFs are CodegenFallback) — two exchanges and a sort for
  * work with zero cross-row dependencies. Here the whole chunker is one
  * fused loop per row (gram md5s fed incrementally from the raw word
  * bytes, boundary flags, exclusive prefix sum, chunk signature md5s),
  * and the only remaining exchange in the query is the one the PROBLEM
  * requires: the corpus-wide chunk-signature df count. That is the guide
  * §2.4 "remove shuffles outright" move — at 100 TB it deletes a full
  * token-table shuffle+sort per run.
  *
  * Semantics (pinned by CdcChunksSpec against the retained reference,
  * and by the DuckDB oracle end to end): boundary AFTER token i iff
  * i ≥ 2 and the first hex digit of md5(w[i−2]+" "+w[i−1]+" "+w[i]) is
  * '0' or '1'; chunk id = exclusive prefix sum of boundary flags; chunk
  * signature = md5 of the space-joined tokens of the chunk; n_tokens =
  * token count. Returns ARRAY<STRUCT<chunk_id, sig, n_tokens>> (empty
  * input array → single empty-string token chunk, exactly like the
  * exploded shape; null input → null, and the downstream explode drops
  * the row as posexplode did).
  */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_id", LongType, nullable = false),
    StructField("sig", StringType, nullable = false),
    StructField("n_tokens", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(words: Any): Any =
    CdcChunks.chunks(words.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CdcChunks.chunks($a);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val Space = ' '.toByte
  private val HexChars = "0123456789abcdef".getBytes

  private def hex32(dig: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((dig(i) >> 4) & 0xF)
      out(2 * i + 1) = HexChars(dig(i) & 0xF)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def chunks(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val md = mdLocal.get()
    val words = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      // split() never yields null elements; a null survives as empty
      // bytes, matching concat_ws's null-skip in the gram (defensive)
      words(i) = if (arr.isNullAt(i)) Array.emptyByteArray
        else arr.getUTF8String(i).getBytes
      i += 1
    }
    val out = new java.util.ArrayList[InternalRow]()
    var chunkId = 0L
    var start = 0
    i = 0
    while (i < n) {
      // boundary AFTER token i: first md5 hex digit of the trailing
      // 3-gram ∈ {0,1} ⇔ high nibble of digest byte 0 is 0 or 1
      var boundary = false
      if (i >= 2) {
        md.update(words(i - 2)); md.update(Space)
        md.update(words(i - 1)); md.update(Space)
        md.update(words(i))
        boundary = ((md.digest()(0) >> 4) & 0xF) <= 1
      }
      if (boundary || i == n - 1) {
        // emit chunk [start..i]: sig = md5 of space-joined tokens
        var j = start
        while (j <= i) {
          if (j > start) md.update(Space)
          md.update(words(j))
          j += 1
        }
        out.add(new GenericInternalRow(Array[Any](
          chunkId, hex32(md.digest()), (i - start + 1).toLong)))
        chunkId += 1
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[InternalRow](out.size)))
  }
}
