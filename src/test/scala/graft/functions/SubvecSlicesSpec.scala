package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftaccess.ColumnBridge

/** Differential pin for the native PQ subvector front end
  * ([[SubvecSlicesExpr]] / [[ResidualSubvecSlicesExpr]]): values AND
  * nesting must reproduce the HOF references —
  * `transform(sequence(0, m−1), s -> slice(xq, s·sub+1, sub))` and the
  * same over `zip_with(xq, ccq, (x, c) -> x − c)` — including the
  * shapes the fixed-dim quantized grid never produces (short arrays →
  * truncated/empty slices; length-mismatched residual inputs →
  * zip_with's null padding; null elements).
  */
class SubvecSlicesSpec extends SparkSpec {
  import spark.implicits._

  private def native(c: Column, m: Int, sub: Int): Column =
    ColumnBridge.column(SubvecSlicesExpr(ColumnBridge.expression(c), m, sub))

  private def nativeRes(x: Column, c: Column, m: Int, sub: Int): Column =
    ColumnBridge.column(ResidualSubvecSlicesExpr(
      ColumnBridge.expression(x), ColumnBridge.expression(c), m, sub))

  private def refSlices(name: String, m: Int, sub: Int): Column =
    expr(s"transform(sequence(0, ${m - 1}), s -> slice($name, s * $sub + 1, $sub))")

  // exact-length grid vectors plus every degenerate length regime
  private val vecs: Seq[(Long, Seq[java.lang.Long], Seq[java.lang.Long])] = {
    def v(n: Int, off: Int): Seq[java.lang.Long] =
      (0 until n).map(i => java.lang.Long.valueOf((i * 7 + off).toLong))
    Seq(
      (1L, v(64, 1), v(64, 3)),         // the pqM·pqSub = 64 grid shape
      (2L, v(16, 2), v(16, 5)),         // short: trailing slices empty
      (3L, v(0, 0), v(0, 0)),           // empty arrays
      (4L, v(67, 1), v(67, 2)),         // not a multiple of sub
      (5L, v(64, 4), v(32, 1)),         // residual length mismatch (x longer)
      (6L, v(32, 4), v(64, 1)),         // residual length mismatch (c longer)
      (7L, Seq[java.lang.Long](1L, null, 3L, 4L, 5L, 6L, 7L, 8L, 9L),
        Seq[java.lang.Long](1L, 2L, null, 4L, 5L, 6L, 7L, 8L, 9L)))
  }

  test("native slices == transform/slice reference across length regimes") {
    val rows = vecs.toDF("id", "xq", "cq")
      .select($"id", native($"xq", 8, 8).as("n"),
        refSlices("xq", 8, 8).as("r"))
      .orderBy($"id").collect()
    rows.foreach(r => assert(r.get(1) == r.get(2),
      s"id ${r.get(0)}: native ${r.get(1)} != ref ${r.get(2)}"))
  }

  test("native residual slices == zip_with+transform reference (incl. mismatch/null)") {
    val rows = vecs.toDF("id", "xq", "cq")
      .withColumn("rq", zip_with($"xq", $"cq", (x, c) => x - c))
      .select($"id", nativeRes($"xq", $"cq", 8, 8).as("n"),
        refSlices("rq", 8, 8).as("r"))
      .orderBy($"id").collect()
    rows.foreach(r => assert(r.get(1) == r.get(2),
      s"id ${r.get(0)}: native ${r.get(1)} != ref ${r.get(2)}"))
  }

  test("random sweep at odd (m, sub) shapes") {
    val rnd = new scala.util.Random(183)
    val data = (0L until 200L).map { i =>
      val nx = rnd.nextInt(40)
      val nc = if (rnd.nextBoolean()) nx else rnd.nextInt(40)
      (i, Seq.fill(nx)(java.lang.Long.valueOf(rnd.nextInt(20000).toLong - 10000L)),
        Seq.fill(nc)(java.lang.Long.valueOf(rnd.nextInt(20000).toLong - 10000L)))
    }
    Seq((3, 5), (8, 8), (1, 64)).foreach { case (m, sub) =>
      val rows = data.toDF("id", "xq", "cq")
        .withColumn("rq", zip_with($"xq", $"cq", (x, c) => x - c))
        .select($"id",
          native($"xq", m, sub).as("n1"), refSlices("xq", m, sub).as("r1"),
          nativeRes($"xq", $"cq", m, sub).as("n2"), refSlices("rq", m, sub).as("r2"))
        .collect()
      rows.foreach { r =>
        assert(r.get(1) == r.get(2), s"(m=$m,sub=$sub) id ${r.get(0)} slices diverge")
        assert(r.get(3) == r.get(4), s"(m=$m,sub=$sub) id ${r.get(0)} residuals diverge")
      }
    }
  }

  test("the PQ encode scan projection stays inside whole-stage codegen") {
    val plan = vecs.toDF("id", "xq", "cq")
      .select($"id", posexplode(nativeRes($"xq", $"cq", 8, 8)).as(Seq("sub", "sxq")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("residual_subvec_slices"), s"native missing:\n$plan")
    assert(plan.contains("*(1) Generate posexplode(residual_subvec_slices"),
      s"expected the posexplode inside codegen stage 1:\n$plan")
  }
}
