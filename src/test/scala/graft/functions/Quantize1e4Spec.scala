package graft.functions

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Differential pin: the native [[Quantize1e4]] codegen expression
  * must be element-wise identical to the declarative HOF reference
  * (`Similarity.quantize1e4Reference`) across every input regime —
  * finite unit-scale, boundary magnitudes, negative halves, NaN/±Inf
  * components, null elements, empty arrays, varying dims. The
  * reference IS the specification (it is what the engine shipped and
  * what the scaladoc reasons about); the native expression is a
  * mechanical rewrite for whole-stage codegen.
  */
class Quantize1e4Spec extends SparkSpec {
  import spark.implicits._

  private def diff(rows: Seq[Seq[java.lang.Float]]): Unit = {
    val df = rows.toDF("embedding")
      .select($"embedding".cast("array<float>").as("embedding"))
    val out = df.select(
      Similarity.quantize1e4($"embedding").as("native"),
      Similarity.quantize1e4Reference($"embedding").as("ref"))
      .collect()
    out.zip(rows).foreach { case (r, in) =>
      assert(r.get(0) == r.get(1),
        s"native ${r.get(0)} != reference ${r.get(1)} for input $in")
    }
  }

  private def f(x: Double): java.lang.Float = java.lang.Float.valueOf(x.toFloat)

  test("native == reference on finite, degenerate, null-element, and empty inputs") {
    diff(Seq(
      Seq(f(0.5), f(-0.25), f(0), f(1)),               // unit-scale
      Seq(f(1e6), f(0), f(0), f(0)),                   // over the norm-safe bound → zeros
      Seq(f(1.5e5), f(1.5e5), f(1.5e5), f(1.5e5)),     // just under at 4 dims
      Seq(f(Float.NaN), f(1), f(0), f(0)),             // NaN → zeros
      Seq(f(Float.PositiveInfinity), f(0), f(1), f(0)),// +Inf → zeros
      Seq(f(Float.NegativeInfinity), f(2), f(0), f(0)),// −Inf → zeros
      Seq(f(-2.5e-4), f(2.5e-4), f(-0.00035)),         // HALF_UP on negative halves
      Seq(null, f(0.5), f(-1)),                        // null element passes through
      Seq(null, f(Float.NaN)),                         // null + NaN → zeros (null → 0 too)
      Seq.empty[java.lang.Float],                      // empty → empty
      Seq(f(9e13), f(0))                               // old cast bound, 2 dims: over norm bound → zeros
    ))
  }

  test("native == reference on a broad random sweep, multiple dims") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 500).map { i =>
      val dims = 1 + rnd.nextInt(96)
      (0 until dims).map { _ =>
        rnd.nextInt(20) match {
          case 0 => f(Float.NaN)
          case 1 => f(Float.PositiveInfinity)
          case 2 => null
          case 3 => f((rnd.nextDouble() - 0.5) * 1e6) // around the bound
          case _ => f(rnd.nextGaussian())
        }
      }
    }
    diff(rows)
  }

  test("ARRAY<DOUBLE> inputs (the PCA projection paths) match the reference too") {
    val rows = Seq(
      Seq[java.lang.Double](0.5, -0.25, 1e-7),
      Seq[java.lang.Double](1e6, 0.0, 0.0),
      Seq[java.lang.Double](Double.NaN, 1.0),
      Seq[java.lang.Double](null, -2.5e-4))
    val df = rows.toDF("embedding")
      .select($"embedding".cast("array<double>").as("embedding"))
    val out = df.select(
      Similarity.quantize1e4($"embedding").as("native"),
      Similarity.quantize1e4Reference($"embedding").as("ref")).collect()
    out.foreach(r => assert(r.get(0) == r.get(1), s"double-path diverged: $r"))
  }

  test("the catalog path really is the native expression (plan shows quantize1e4, not aggregate/transform)") {
    val plan = Seq(Seq(f(1), f(2))).toDF("embedding")
      .select($"embedding".cast("array<float>").as("embedding"))
      .select(Similarity.quantize1e4($"embedding").as("xq"))
      .queryExecution.analyzed.toString
    assert(plan.contains("quantize1e4"), s"native expression missing from plan:\n$plan")
    assert(!plan.contains("aggregate("), s"HOF fold leaked into the shipped path:\n$plan")
  }
}
