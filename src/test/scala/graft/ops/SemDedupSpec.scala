package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cap semantics for the SemDeDup oversized-cluster guard
  * (Similarity.semanticCappedCore / semanticCappedQuery): a degenerate
  * codebook must be excluded and REPORTED, a non-binding cap must
  * reproduce the uncapped output exactly, and the gate row's binding
  * branch must actually bind at the gate scale factor.
  */
class SemDedupSpec extends SparkSpec {

  // Hand-built degenerate assignment: cluster 0 holds 5 of 7 vectors
  // (the runaway list), cluster 1 holds two near-parallel vectors.
  // Vectors are 2-d on the 1e4 integer grid, pre-quantized like
  // coarseFrontEnd's base table.
  private def fixture() = {
    import spark.implicits._
    graft.functions.GraftExtensions.register(spark)
    val assigned = Seq(
      (0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L),
      (10L, 1L), (11L, 1L)).toDF("vec_id", "centroid")
    val vecs = Seq(
      0L -> Seq(10000L, 0L), 1L -> Seq(10000L, 100L),
      2L -> Seq(0L, 10000L), 3L -> Seq(10000L, 200L), 4L -> Seq(300L, 10000L),
      10L -> Seq(7000L, 7000L), 11L -> Seq(7100L, 6900L))
    val base = vecs.toDF("vec_id", "xq")
      .withColumn("n2", Similarity.dot64($"xq", $"xq"))
    (assigned, base)
  }

  test("binding cap excludes and reports the degenerate cluster, keeps scoring the rest") {
    val (assigned, base) = fixture()
    val out = Similarity.semanticCappedCore(assigned, base, cap = 4L)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    // all five cluster-0 members reported with the sentinel, never scored
    for (v <- Seq(0L, 1L, 2L, 3L, 4L))
      assert(out(v) == ((0L, -1L, v, true)), s"vec $v: ${out(v)}")
    // cluster 1 (size 2 ≤ cap) deduped normally: 10 and 11 are
    // near-parallel (cos ≈ 0.9998 ≥ τ), so 11 drops onto 10
    assert(out(10L) == ((1L, 1L, 10L, false)))
    assert(out(11L) == ((1L, 0L, 10L, false)))
  }

  test("non-binding cap reproduces uncapped pair semantics on the fixture") {
    import spark.implicits._
    val (assigned, base) = fixture()
    val out = Similarity.semanticCappedCore(assigned, base, cap = 100L)
    assert(out.filter($"excluded_cluster").count() == 0)
    val rows = out.collect().map(r => (r.getLong(0), (r.getLong(2), r.getLong(3)))).toMap
    // cluster 0: 1 and 3 are near-parallel to 0 (x-axis), 4 to 2
    // (y-axis); cross-axis cos ≈ 0 < τ
    assert(rows(0L) == ((1L, 0L)) && rows(1L) == ((0L, 0L)) && rows(3L) == ((0L, 0L)))
    assert(rows(2L) == ((1L, 2L)) && rows(4L) == ((0L, 2L)))
    assert(rows(10L) == ((1L, 10L)) && rows(11L) == ((0L, 10L)))
  }

  test("gate row: binding cap binds at sf0.01 and loose branch equals plain semanticDedup") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val out = Similarity.semanticCappedQuery(spark, dir).persist()
    try {
      val binding = out.filter($"max_cluster" === Similarity.semanticCapBinding)
      // pigeonhole: ⌈500/16⌉ = 32 > 31, so at least one cluster is
      // excluded — the branch the cap exists for is exercised
      assert(binding.filter($"excluded_cluster").count() > 0,
        "binding cap excluded nothing at sf0.01 — gate no longer differential")
      val loose = out.filter($"max_cluster" === Similarity.semanticCapLoose)
        .select($"vec_id", $"centroid", $"kept", $"dup_of")
      val plain = Similarity.semanticDedup(spark, dir)
        .select($"vec_id", $"centroid", $"kept", $"dup_of")
      assert(loose.except(plain).isEmpty && plain.except(loose).isEmpty,
        "loose-cap branch diverged from uncapped semanticDedup")
    } finally out.unpersist()
  }
}
