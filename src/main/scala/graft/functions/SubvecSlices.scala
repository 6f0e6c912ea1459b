package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen subvector front end of the PQ family
  * ([[graft.ops.Similarity]]): split a quantized vector — or the
  * residual difference of two — into `m` subvectors of `sub` dims each,
  * ready for `posexplode`.
  *
  * The declarative shapes these replace —
  * `transform(sequence(0, m−1), s -> slice(xq, s·sub+1, sub))` and
  * `zip_with(xq, ccq, (x, c) -> x − c)` feeding the same transform —
  * are higher-order functions, which evaluate interpreted
  * (CodegenFallback) and break whole-stage codegen at the head of every
  * PQ encode/probe scan (the [[MinHashShingles]] / `Quantize1e4`
  * failure mode). Each row is one fused loop; the residual variant
  * never materializes the intermediate difference array.
  *
  * Semantics match the HOF chain exactly (SubvecSlicesSpec pins both):
  * slice truncates at the array end (`slice(arr, start, len)` past the
  * end yields a short or empty slice); the residual's zip_with runs to
  * the LONGER input's length, null-padding the shorter side, and
  * null − x = null, so trailing residual elements where the lengths
  * disagree are null (never the case on the fixed-dim quantized grid,
  * but the parity is pinned, not assumed).
  */
object SubvecSlices {

  def slices(x: ArrayData, m: Int, sub: Int): ArrayData = {
    val len = x.numElements()
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val start = s * sub
      val take = math.max(0, math.min(len - start, sub))
      val piece = new Array[Any](take)
      var j = 0
      while (j < take) {
        piece(j) = if (x.isNullAt(start + j)) null else x.getLong(start + j)
        j += 1
      }
      out(s) = new GenericArrayData(piece)
      s += 1
    }
    new GenericArrayData(out)
  }

  def residualSlices(x: ArrayData, c: ArrayData, m: Int, sub: Int): ArrayData = {
    val lx = x.numElements()
    val lc = c.numElements()
    val len = math.max(lx, lc)
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val start = s * sub
      val take = math.max(0, math.min(len - start, sub))
      val piece = new Array[Any](take)
      var j = 0
      while (j < take) {
        val i = start + j
        piece(j) =
          if (i >= lx || i >= lc || x.isNullAt(i) || c.isNullAt(i)) null
          else x.getLong(i) - c.getLong(i)
        j += 1
      }
      out(s) = new GenericArrayData(piece)
      s += 1
    }
    new GenericArrayData(out)
  }

  private[functions] def checkLongArray(dt: DataType, name: String,
      m: Int): TypeCheckResult = dt match {
    case ArrayType(LongType, _) if m >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
      s"$name requires m >= 1")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires ARRAY<BIGINT>, got ${other.simpleString}")
  }
}

/** `subvec_slices(ARRAY<BIGINT> xq, m, sub)` — see
  * [[SubvecSlices.slices]]. */
case class SubvecSlicesExpr(child: Expression, m: Int, sub: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = true), containsNull = false)
  override def prettyName: String = "subvec_slices"

  override def checkInputDataTypes(): TypeCheckResult =
    SubvecSlices.checkLongArray(child.dataType, prettyName, m)

  override protected def nullSafeEval(x: Any): Any =
    SubvecSlices.slices(x.asInstanceOf[ArrayData], m, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SubvecSlices.slices($a, $m, $sub);")

  override protected def withNewChildInternal(newChild: Expression): SubvecSlicesExpr =
    copy(child = newChild)
}

/** `residual_subvec_slices(ARRAY<BIGINT> xq, ARRAY<BIGINT> ccq, m, sub)`
  * — see [[SubvecSlices.residualSlices]]. */
case class ResidualSubvecSlicesExpr(left: Expression, right: Expression,
    m: Int, sub: Int) extends BinaryExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = true), containsNull = false)
  override def prettyName: String = "residual_subvec_slices"

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = SubvecSlices.checkLongArray(left.dataType, prettyName, m)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else SubvecSlices.checkLongArray(right.dataType, prettyName, m)
  }

  override protected def nullSafeEval(x: Any, c: Any): Any =
    SubvecSlices.residualSlices(
      x.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], m, sub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SubvecSlices.residualSlices($a, $b, $m, $sub);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ResidualSubvecSlicesExpr =
    copy(left = newLeft, right = newRight)
}
