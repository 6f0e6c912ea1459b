package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PCA-rotated prefix ANN — the frozen-model composition of the r12
  * truncation study, productized. Pins the two claims:
  *   1. rotation never changes the FINAL ranking — with a
  *      corpus-covering shortlist the rotated probe equals exact
  *      brute force (stage 2 rescores with original vectors);
  *   2. on a corpus whose similarity structure lives in a low-rank
  *      subspace NOT aligned with the storage axes (the planted-basis
  *      fixture), the rotated prefix recalls dramatically more of the
  *      true top-3 than the raw prefix at the SAME byte budget —
  *      the reason the composition exists.
  */
class RotatedPrefixSpec extends SparkSpec {
  import spark.implicits._

  /** x = A·z + σ·noise: 32-dim vectors whose variance lives in a
    * 4-dim planted subspace spanned by dense random directions.
    */
  private def plantedCorpus(n: Int, seed: Long): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    val a = Array.fill(4, 32)(rnd.nextGaussian())
    (0L until n.toLong).map { id =>
      val z = Array.fill(4)(rnd.nextGaussian())
      val x = Array.tabulate(32) { j =>
        ((0 until 4).map(r => a(r)(j) * z(r)).sum + rnd.nextGaussian() * 0.05)
          .toFloat
      }
      (id, x)
    }
  }

  private def asTriples(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet

  private def writeDir(rows: Seq[(Long, Array[Float])]): String = {
    val dir = tmpDir("rotprefix").toString
    rows.toDF("vec_id", "embedding").coalesce(1)
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("corpus-covering shortlist: rotated probe == exact brute-force top-3") {
    val dir = writeDir(plantedCorpus(60, seed = 3))
    val emb = graft.Tables.t(spark, dir, "embeddings")
    val model = Similarity.trainPcaModel(spark, emb, k = 4)
    graft.CacheScope.drain()
    val exact = asTriples(Similarity.bruteForceTopK(spark, dir).filter($"rank" <= 3))
    graft.CacheScope.drain()
    val idx = Similarity.buildRotatedPrefixIndex(spark, emb, model, dims = 4)
    val got = asTriples(Similarity.probeRotatedPrefixIndex(
      spark, emb, emb.filter($"vec_id" % 50 === 0), model, idx, dims = 4))
    assert(exact.nonEmpty && got == exact,
      s"missing=${(exact -- got).take(5)} extra=${(got -- exact).take(5)}")
  }

  test("planted low-rank corpus: rotated prefix recall beats raw at the same bytes") {
    val dir = writeDir(plantedCorpus(600, seed = 17))
    val emb = graft.Tables.t(spark, dir, "embeddings").persist()
    val queries = emb.filter($"vec_id" % 50 === 0)
    // full-dim truth, computed like the study tool
    val truth = asTriples(Similarity.bruteForceTopK(spark, dir).filter($"rank" <= 3))
      .map(t => (t._1, t._2))
    graft.CacheScope.drain()
    def recall(probe: DataFrame): Double = {
      val got = probe.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & truth).size.toDouble / truth.size
    }
    val raw = recall(Similarity.probePrefixIndex(
      spark, emb, queries, Similarity.buildPrefixIndex(spark, emb, dims = 4),
      dims = 4, shortlist = 8))
    graft.CacheScope.drain()
    val model = Similarity.trainPcaModel(spark, emb, k = 4)
    graft.CacheScope.drain()
    // through a parquet round-trip, as a deployment would
    val path = tmpDir("rot-idx").resolve("idx").toString
    Similarity.savePrefixIndex(
      Similarity.buildRotatedPrefixIndex(spark, emb, model, dims = 4), path)
    graft.CacheScope.drain()
    val rotated = recall(Similarity.probeRotatedPrefixIndex(
      spark, emb, queries, model, spark.read.parquet(path), dims = 4,
      shortlist = 8))
    graft.CacheScope.drain()
    emb.unpersist()
    info(f"raw=$raw%.3f rotated=$rotated%.3f")
    assert(rotated > raw, f"rotation did not help: raw=$raw%.3f rotated=$rotated%.3f")
    assert(rotated >= 0.8, f"rotated recall $rotated%.3f below 0.8 on a rank-4 corpus")
  }
}
