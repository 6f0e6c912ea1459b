package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Prefix-truncation two-stage ANN (`q_sim_prefix`): shortlist by
  * cosine over the first [[Similarity.prefixDims]] dims, exact-rescore
  * the top [[Similarity.prefixShortlist]]. The differential gate pins
  * the algorithm bit-for-bit against DuckDB; this spec pins the two
  * SEMANTIC claims the gate can't express:
  *   1. when the shortlist covers the whole corpus the two-stage path
  *      degenerates to exact brute force (rescore correctness), and
  *   2. on the isotropic fixture — the hardest corpus for any
  *      truncation method (tools/trunc_recall_r12.jsonl measured raw
  *      prefix recall 0.45 at 2× compression there) — the R=64
  *      shortlist still recovers a solid majority of the true top-3.
  */
class PrefixTopKSpec extends SparkSpec {
  import spark.implicits._

  test("degenerates to exact brute-force top-3 when the shortlist covers the corpus") {
    // 60 vectors < prefixShortlist + 1 = 65 → stage 1 keeps every
    // candidate, so rank<=3 of the rescore MUST equal exact top-3
    val dir = tmpDir("prefix-exact").toString
    val rnd = new scala.util.Random(7)
    (0L until 60L).map { id =>
      (id, Array.fill(64)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val exact = Similarity.bruteForceTopK(spark, dir)
      .filter($"rank" <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val got = Similarity.prefixTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(exact.nonEmpty, "empty exact baseline — fixture broke")
    assert(got == exact,
      s"two-stage result diverged from exact with a corpus-covering shortlist: " +
        s"missing=${(exact -- got).take(5)} extra=${(got -- exact).take(5)}")
  }

  test("recall@3 vs brute force clears 0.5 on the isotropic sf0.01 fixture") {
    // measured 0.70 at spec-writing time (R=64 of 500 candidates);
    // floor at 0.5 for headroom against fixture regeneration — still
    // ~170× above the 3/499 chance floor
    val dir = "/root/testdata/sf0.01"
    val bf = Similarity.bruteForceTopK(spark, dir)
      .filter($"rank" <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.prefixTopK(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bf.nonEmpty && got.nonEmpty)
    val recall = (got & bf).size.toDouble / bf.size
    assert(recall >= 0.5, f"prefix recall@3 $recall%.2f below 0.5 floor")
  }
}
