package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the
  * canonical-composition pass every text-curation pipeline runs before
  * hashing/deduping, because the same visible string arrives from
  * crawls in both composed (é) and decomposed (e + U+0301) forms and
  * would otherwise defeat exact dedup, shingle hashing, and vocabulary
  * counting. Spark ships no normalizer, so this is a genuine surface
  * gap; a native Expression with codegen (one static
  * `java.text.Normalizer` call inlined into the stage) keeps it inside
  * whole-stage codegen — no UDF boxing, no lambda dispatch — so a
  * 100 TB normalize-then-hash projection stays one fused map stage.
  * Registered as SQL function `nfc_normalize` by [[GraftExtensions]]
  * (same name and semantics as DuckDB's `nfc_normalize`, which is the
  * catalog row's independent oracle).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      v.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.NFC));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
