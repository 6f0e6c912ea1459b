package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Integer-bridge dot product of two float vectors as a native Catalyst
  * expression with whole-stage codegen: Σ round(aᵢ·bᵢ·1e8) as a long.
  *
  * Semantically identical to the higher-order-function formulation
  * `aggregate(zip_with(a, b, (x, y) => round(x·y·1e8) as long), 0, +)`
  * — including Spark Round's decimal HALF_UP (the generated loop calls
  * the same `BigDecimal.valueOf(d).setScale(0, HALF_UP)` Spark's Round
  * uses for doubles, so values are bit-identical to the HOF form and to
  * the DuckDB oracle's `round`; non-finite products take Round's
  * pass-through path and then Java's double→long cast, exactly like the
  * HOF's round().cast("long") on a NaN/±Inf) and including null
  * semantics (length
  * mismatch or any null element → null, as null propagates through the
  * HOF fold). The win is mechanical: higher-order lambdas evaluate
  * interpreted (CodegenFallback) with per-element closure dispatch,
  * boxing, and an intermediate array — this is one fused primitive
  * loop, and it is THE inner loop of every pairwise similarity scan
  * (brute-force rescore, LSH/IVF candidate scoring, embedding
  * near-dup). Registered as SQL function `bridged_dot` by
  * [[GraftExtensions]].
  */
case class BridgedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bridged_dot"

  private def isFloatArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<FLOAT>, ARRAY<FLOAT>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (x.numElements() != y.numElements()) return null
    var sum = 0L
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val p = x.getFloat(i).toDouble * y.getFloat(i).toDouble * 1e8
      // Spark's Round passes non-finite doubles through unchanged
      // (BigDecimal.valueOf would throw on them); the cast-to-long then
      // yields 0 for NaN and Long.Max/MinValue for ±Inf — mirror that so
      // a NaN/Inf element behaves exactly like the HOF round().cast fold
      sum +=
        (if (java.lang.Double.isNaN(p) || java.lang.Double.isInfinite(p)) p.toLong
         else java.math.BigDecimal.valueOf(p)
           .setScale(0, java.math.RoundingMode.HALF_UP).longValue())
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val bad = ctx.freshName("bad")
      val p = ctx.freshName("p")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n != $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  double $p = ((double) $a.getFloat($i)) * ((double) $b.getFloat($i)) * 1.0E8D;
         |  $sum += (Double.isNaN($p) || Double.isInfinite($p))
         |    ? (long) $p
         |    : java.math.BigDecimal.valueOf($p)
         |        .setScale(0, java.math.RoundingMode.HALF_UP).longValue();
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BridgedDot =
    copy(left = newLeft, right = newRight)
}

/** Exact dot product of two ARRAY<BIGINT> quantized vectors:
  * Σ aᵢ·bᵢ as a long — the per-PAIR inner loop of every similarity
  * scan once vectors are pre-quantized to 1e4-scaled longs (so the
  * product scale is 1e8, the bridge's standard). Quantization happens
  * once per VECTOR (N·dim decimal roundings); the N² pair work is then
  * pure integer multiply-add in whole-stage codegen — no BigDecimal,
  * no string allocation, no boxing in the hot loop. Same null
  * semantics as [[BridgedDot]]. Registered as SQL function `dot64` by
  * [[GraftExtensions]].
  */
case class Dot64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot64"

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (x.numElements() != y.numElements()) return null
    var sum = 0L
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      sum += x.getLong(i) * y.getLong(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n != $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  $sum += $a.getLong($i) * $b.getLong($i);
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Dot64 =
    copy(left = newLeft, right = newRight)
}

/** Exact squared L2 distance of two ARRAY<BIGINT> quantized vectors:
  * Σ (aᵢ−bᵢ)² as a long — the k-means assignment inner loop of the IVF
  * codebook training (vectors pre-quantized to 1e4-scaled longs keep
  * every delta ≤ ~1.2e5, so the sum stays far from overflow). Pure
  * integer codegen loop; same null semantics as [[BridgedDot]].
  * Registered as SQL function `sqdist64` by [[GraftExtensions]].
  */
case class SqDist64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sqdist64"

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (x.numElements() != y.numElements()) return null
    var sum = 0L
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      sum += d * d
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val bad = ctx.freshName("bad")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n != $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $sum += $d * $d;
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist64 =
    copy(left = newLeft, right = newRight)
}

/** 1e4 quantization of a float vector as ONE fused native pass:
  * `round(xᵢ·1e4)` as longs, with the whole vector zeroed when any
  * component is non-finite or exceeds the norm-safe grid bound
  * √(Long.Max/dims)/1e4 (see `graft.ops.Similarity.quantize1e4`'s
  * scaladoc for why whole-vector inertness is the contract and why the
  * bound is norm-safe, not merely cast-safe).
  *
  * Semantically identical to the higher-order-function formulation the
  * engine shipped through round 17 (kept as
  * `Similarity.quantize1e4Reference`, differentially pinned by
  * Quantize1e4Spec):
  *
  *  - peak |x| folds over NON-NULL elements (Spark's greatest() skips
  *    nulls; Java Math.max propagates NaN exactly like Spark's
  *    NaN-is-greatest ordering);
  *  - the bad branch maps EVERY element (null included) to 0L, like
  *    `transform(emb, _ => 0L)`;
  *  - the good branch rounds with Spark Round's decimal HALF_UP
  *    (`BigDecimal.setScale(0, HALF_UP)` — the [[BridgedDot]]
  *    discipline, bit-identical to the DuckDB oracle's round) and maps
  *    null elements to null, like `transform`'s lambda on null input;
  *  - an empty array quantizes to an empty array (the bound divides by
  *    zero into +Infinity, which nothing exceeds).
  *
  * The win is mechanical, same as [[BridgedDot]]: the HOF chain
  * (aggregate fold + exists/when + transform) evaluates interpreted
  * (CodegenFallback) with per-element lambda dispatch and an
  * intermediate array per operator, and it breaks whole-stage codegen
  * wherever a query quantizes — which is every similarity, PCA,
  * semantic-dedup, and decontamination scan's first pass over the
  * vectors. Registered as SQL function `quantize1e4` by
  * [[GraftExtensions]]; `Similarity.quantize1e4` builds it directly
  * (no registration dependency).
  */
case class Quantize1e4(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "quantize1e4"

  private def childContainsNull: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  }

  override def dataType: DataType = ArrayType(LongType, childContainsNull)

  // float is the storage type everywhere; double covers the PCA paths
  // whose projected vectors are already double (the HOF form accepted
  // any numeric array via cast — these two are the types in use)
  private lazy val elementIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${t.simpleString}")
  }

  override def nullable: Boolean = true

  private def halfUp(p: Double): Long =
    java.math.BigDecimal.valueOf(p)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    def elem(i: Int): Double =
      if (elementIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
    val n = a.numElements()
    var peak = 0.0
    var hasNull = false
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) hasNull = true
      else peak = math.max(peak, math.abs(elem(i)))
      i += 1
    }
    val maxAbs = (math.sqrt(Long.MaxValue.toDouble / n) - 1.0) / 1e4
    if (java.lang.Double.isNaN(peak) || peak > maxAbs)
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(new Array[Long](n))
    else if (!hasNull) {
      val out = new Array[Long](n)
      i = 0
      while (i < n) {
        out(i) = halfUp(elem(i) * 1e4)
        i += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        if (!a.isNullAt(i)) out(i) = halfUp(elem(i) * 1e4)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val peak = ctx.freshName("peak")
      val hasNull = ctx.freshName("hasNull")
      val maxAbs = ctx.freshName("maxAbs")
      val outL = ctx.freshName("outL")
      val outO = ctx.freshName("outO")
      def elem(idx: String): String =
        if (elementIsFloat) s"((double) $a.getFloat($idx))" else s"$a.getDouble($idx)"
      s"""
         |int $n = $a.numElements();
         |double $peak = 0.0D;
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $hasNull = true; }
         |  else { $peak = Math.max($peak, Math.abs(${elem(i)})); }
         |}
         |double $maxAbs =
         |  (Math.sqrt(((double) java.lang.Long.MAX_VALUE) / (double) $n) - 1.0D) / 1.0E4D;
         |if (Double.isNaN($peak) || $peak > $maxAbs) {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray(new long[$n]);
         |} else if (!$hasNull) {
         |  long[] $outL = new long[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $outL[$i] = java.math.BigDecimal
         |      .valueOf(${elem(i)} * 1.0E4D)
         |      .setScale(0, java.math.RoundingMode.HALF_UP).longValue();
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($outL);
         |} else {
         |  Object[] $outO = new Object[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      $outO[$i] = java.math.BigDecimal
         |        .valueOf(${elem(i)} * 1.0E4D)
         |        .setScale(0, java.math.RoundingMode.HALF_UP).longValue();
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($outO);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Quantize1e4 =
    copy(child = newChild)
}
