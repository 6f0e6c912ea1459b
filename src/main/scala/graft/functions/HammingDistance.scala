package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Hamming distance between two 64-bit fingerprints (e.g. SimHash
  * values) as a native Catalyst expression with whole-stage codegen —
  * the extension tier below a custom plan node (builder guidance:
  * native `Expression` with `doGenCode` beats a Scala UDF). The
  * generated code is a branch-free `Long.bitCount(a ^ b)` inlined into
  * the stage — no boxing, no lambda dispatch, exactly what the hot
  * inner loop of a pairwise near-dup scan needs. Registered as SQL
  * function `hamming64` by [[GraftExtensions]].
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BIGINT, BIGINT), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = java.lang.Long.bitCount($a ^ $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}
