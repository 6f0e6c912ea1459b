package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Arrival-order semantic dedup admission
  * (Similarity.createSemanticDedupIndex / admitSemanticDedup /
  * compactSemanticDedupIndex): the embedding sibling of the exact
  * admission index. Pins the documented admission rule against a
  * hand-checked corpus, replay idempotence per batch id, compaction
  * transparency, the whole-corpus batch-twin against semanticDedup,
  * and the loud failure modes.
  */
class SemanticAdmitSpec extends SparkSpec {
  import spark.implicits._

  private def v(x: Double*): Array[Float] = x.map(_.toFloat).toArray

  // Hand-checked 4-d corpus, τ = 0.95. Within a batch the LOWER id is
  // the anchor; across batches only ADMITTED vectors reject.
  //   b0: 2 is an in-batch near-dup of 0            → adm {0, 1}
  //   b1: 4 in-batch dup of 3; 6 in-batch dup of 5;
  //       3 and 7 index-rejected (vs 0 / vs 1) — so 4's anchor is
  //       itself rejected and the whole family dies (the SemDeDup
  //       greedy collapse, mirroring exact admission)  → adm {5}
  //   b2: 9 index-rejected vs 0; 10 is cos = −1 to 8 (NOT a dup)
  //                                                   → adm {8, 10}
  private val b0 = Seq(
    0L -> v(10, 0, 0, 0), 1L -> v(0, 10, 0, 0), 2L -> v(10, 0.2, 0, 0))
  private val b1 = Seq(
    3L -> v(10, 0.4, 0, 0), 4L -> v(10, 0.45, 0, 0),
    5L -> v(0, 0, 10, 0), 6L -> v(0, 0, 10, 0.1), 7L -> v(0, 9.8, 0.5, 0))
  private val b2 = Seq(
    8L -> v(0, 0, 0, 10), 9L -> v(10, 0, 0.3, 0), 10L -> v(0, 0, 0, -10))
  private def df(rows: Seq[(Long, Array[Float])]) =
    rows.toDF("vec_id", "embedding")

  private def newIndex(name: String): String = {
    val path = tmpDir(name).toString + "/semidx"
    // k = 1 ⇒ one cluster: the admission ORDER rules are under test
    // here, not the clustering (the batch-twin and the gate row cover
    // the trained-codebook path)
    Similarity.createSemanticDedupIndex(spark, path,
      df(b0 ++ b1 ++ b2), tauMilli = 950L, k = 1, iters = 1)
    graft.CacheScope.drain()
    path
  }

  private def admitIds(batch: Seq[(Long, Array[Float])], path: String,
      id: Long): Set[Long] = {
    val out = Similarity.admitSemanticDedup(df(batch), path, id)
      .select($"vec_id").as[Long].collect().toSet
    graft.CacheScope.drain()
    out
  }

  private def indexRows(path: String): Seq[(Long, Long)] =
    spark.read.option("basePath", s"$path/vecs").parquet(s"$path/vecs")
      .select($"vec_id", $"batch".cast("long"))
      .as[(Long, Long)].collect().toSeq

  test("arrival-order admission matches the hand-checked rule, batch by batch") {
    val path = newIndex("graft-semadmit")
    assert(admitIds(b0, path, 0L) == Set(0L, 1L))
    assert(admitIds(b1, path, 1L) == Set(5L))
    assert(admitIds(b2, path, 2L) == Set(8L, 10L))
    // the persisted layout holds exactly the admitted ids, each in its
    // own generation
    assert(indexRows(path).sorted ==
      Seq((0L, 0L), (1L, 0L), (5L, 1L), (8L, 2L), (10L, 2L)))
    // the admitted frame carries the batch's ORIGINAL columns
    val cols = Similarity.admitSemanticDedup(df(b2), path, 2L).columns.toSeq
    graft.CacheScope.drain()
    assert(cols == Seq("vec_id", "embedding"))
  }

  test("replay is idempotent per batch id: same admitted set, no duplicate index rows") {
    val path = newIndex("graft-semadmit-replay")
    admitIds(b0, path, 0L)
    val first = admitIds(b1, path, 1L)
    // the replay sees its own orphaned generation in the index — it
    // must be replaced, not self-reject the batch
    val replay = admitIds(b1, path, 1L)
    assert(replay == first && first == Set(5L))
    val rows = indexRows(path)
    assert(rows.map(_._1).distinct.size == rows.size,
      s"duplicate index rows after replay: $rows")
    assert(rows.toSet == Set((0L, 0L), (1L, 0L), (5L, 1L)))
  }

  test("compaction folds all but the live generation and is invisible to admission") {
    val plain = newIndex("graft-semadmit-plain")
    val folded = newIndex("graft-semadmit-folded")
    val b3 = Seq(11L -> v(10, 0.1, 0, 0), 12L -> v(0, 0, 9, 9))
    for (p <- Seq(plain, folded)) {
      admitIds(b0, p, 0L); admitIds(b1, p, 1L); admitIds(b2, p, 2L)
    }
    // batches 0 and 1 fold into generation -1; live batch 2 untouched
    assert(Similarity.compactSemanticDedupIndex(spark, folded) == 2)
    graft.CacheScope.drain()
    assert(indexRows(folded).toSet ==
      Set((0L, -1L), (1L, -1L), (5L, -1L), (8L, 2L), (10L, 2L)))
    // nothing to fold twice: only {-1, 2} remain, one is live
    assert(Similarity.compactSemanticDedupIndex(spark, folded) == 0)
    // 11 rejects against the FOLDED generation exactly as against the
    // per-batch layout; 12 admits on both
    val a = admitIds(b3, plain, 3L)
    val b = admitIds(b3, folded, 3L)
    assert(a == b && a == Set(12L))
    assert(indexRows(plain).map(_._1).toSet == indexRows(folded).map(_._1).toSet)
  }

  test("whole-corpus single batch == semanticDedup's kept set (frozen-codebook batch twin)") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.Tables.t(spark, dir, "embeddings")
    val path = tmpDir("graft-semadmit-twin").toString + "/semidx"
    Similarity.createSemanticDedupIndex(spark, path, emb,
      (Similarity.semanticTau * 1000).toLong)
    graft.CacheScope.drain()
    val admitted = Similarity.admitSemanticDedup(emb, path, 0L)
      .select($"vec_id").as[Long].collect().toSet
    graft.CacheScope.drain()
    val kept = Similarity.semanticDedup(spark, dir)
      .filter($"kept" === 1L).select($"vec_id").as[Long].collect().toSet
    graft.CacheScope.drain()
    assert(admitted == kept && admitted.nonEmpty)
  }

  test("empty and all-rejected batches write no generation") {
    val path = newIndex("graft-semadmit-empty")
    admitIds(b0, path, 0L)
    // all-rejected: both rows are near-dups of admitted vector 0
    val rejected = Seq(20L -> v(10, 0.05, 0, 0), 21L -> v(10, 0.06, 0, 0))
    assert(admitIds(rejected, path, 1L).isEmpty)
    assert(admitIds(Seq.empty, path, 2L).isEmpty)
    val gens = new java.io.File(s"$path/vecs").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(gens == Set("batch=0"), s"unexpected generations: $gens")
  }

  test("cross-batch index scan prunes to the touched centroid partitions (records-read proof)") {
    // the scale claim on admitSemanticDedup, measured instead of
    // narrated: a batch confined to ONE coarse cluster must read only
    // that cluster's partition of the accumulated index, not the whole
    // history. 16-d Gaussians are pairwise non-dup at τ = 0.95, so a
    // 2-means index admits all of them split across two clusters; a
    // second batch made of near-copies of ONE cluster's members (new
    // ids) assigns entirely to that cluster — its admission should
    // scan roughly half the index's records, never all of them.
    val rnd = new scala.util.Random(41)
    val corpus = (0L until 2000L).map(id =>
      (id, Array.fill(16)(rnd.nextGaussian().toFloat)))
    val path = tmpDir("graft-semadmit-prune").toString + "/semidx"
    Similarity.createSemanticDedupIndex(spark, path,
      corpus.toDF("vec_id", "embedding"), tauMilli = 950L, k = 2, iters = 2)
    graft.CacheScope.drain()
    assert(Similarity.admitSemanticDedup(
      corpus.toDF("vec_id", "embedding"), path, 0L).count() == 2000L)
    graft.CacheScope.drain()
    // pick the MINORITY cluster and 10 of its members — the bound is
    // then decisive (seeded 2-means on Gaussians splits unevenly;
    // this run's is ~1450/550)
    val byCentroid = spark.read.option("basePath", s"$path/vecs")
      .parquet(s"$path/vecs").select($"vec_id", $"centroid".cast("long"))
      .as[(Long, Long)].collect().toMap
    val c0 = byCentroid.values.groupBy(identity).minBy(_._2.size)._1
    val clusterSize = byCentroid.values.count(_ == c0)
    assert(clusterSize <= 1000, s"minority cluster is not a minority: $clusterSize of 2000")
    val memberIds = byCentroid.collect { case (id, c) if c == c0 => id }
      .toList.sorted.take(10)
    val emb = corpus.toMap
    val batch = memberIds.zipWithIndex.map { case (id, i) =>
      (9000L + i, emb(id).map(x => x + 0.001f)) }
    val (admitted, m) = graft.exec.SparkMetrics.measure(spark) {
      Similarity.admitSemanticDedup(batch.toDF("vec_id", "embedding"), path, 1L).count()
    }
    graft.CacheScope.drain()
    assert(admitted == 0L, s"near-copies must all reject, admitted $admitted")
    // records read = the touched cluster's rows + the 2-row codebook
    // (+ partition-discovery slack) — decisively under the full index
    assert(m.inputRecords <= clusterSize + 100,
      s"index scan read ${m.inputRecords} records — pruning to the " +
        s"touched centroid ($clusterSize rows) did not happen")
  }

  test("zero-norm embeddings define cos = 0: admitted, never dups, never decontaminated, no ANSI crash") {
    // a dead encoder's all-zero vector used to be an ANSI
    // DIVIDE_BY_ZERO inside cosineFromDots — one degenerate row killed
    // the whole admission job. The convention: cos(0, x) = 0, so zero
    // vectors are similar to NOTHING — they admit (content dedup is
    // the exact family's job), they never anchor a rejection, and a
    // decontamination pass never drops them (or anything else) on
    // their account.
    val corpus = Seq(
      0L -> v(10, 0, 0, 0), 1L -> v(0, 0, 0, 0), 2L -> v(0, 0, 0, 0),
      3L -> v(10, 0.1, 0, 0))
    val path = tmpDir("graft-semadmit-zero").toString + "/semidx"
    Similarity.createSemanticDedupIndex(spark, path, df(corpus),
      tauMilli = 950L, k = 1, iters = 1)
    graft.CacheScope.drain()
    // 3 rejects (near-dup of 0); both zero vectors admit — even though
    // they are mutually identical, their similarity is undefined and
    // the semantic family scores representations, not content
    assert(admitIds(corpus, path, 0L) == Set(0L, 1L, 2L))
    // cross-batch: a zero vector arriving later still admits; a real
    // near-dup still rejects (the guard changed nothing for live rows)
    assert(admitIds(Seq(10L -> v(0, 0, 0, 0), 11L -> v(10, 0.2, 0, 0)),
      path, 1L) == Set(10L))
    // decontamination: zero corpus rows survive a live bench, and a
    // zero BENCH vector flags nothing
    val cleaned = Similarity.semanticDecontaminate(spark,
      df(Seq(20L -> v(0, 0, 0, 0), 21L -> v(5, 0, 0, 0))),
      df(Seq(90L -> v(0, 0, 0, 0), 91L -> v(0, 7, 0, 0))), tauMilli = 950L)
      .select($"vec_id").as[Long].collect().toSet
    graft.CacheScope.drain()
    assert(cleaned == Set(20L, 21L))
    // one layer earlier: a NaN/Inf COMPONENT used to be an ANSI
    // CAST_OVERFLOW inside quantize1e4 — a corrupted vector quantizes
    // to all-zeros as a WHOLE (zeroing only the bad component would
    // fabricate a valid-looking vector from the finite remainder), so
    // it admits and anchors nothing, exactly like the zero vector
    val corrupt = Seq(
      30L -> Array(Float.NaN, 1f, 0f, 0f),
      31L -> Array(Float.PositiveInfinity, 0f, 1f, 0f),
      32L -> v(10, 0.3, 0, 0)) // live near-dup of 0: still rejects
    assert(admitIds(corrupt, path, 2L) == Set(30L, 31L))
  }

  test("quantize bound is norm-safe: a finite component that would wrap dot64 zero-quantizes") {
    // r16 advice: the old |x| ≤ 9e14 guard only prevented the cast
    // overflow — a finite 1e6 component at 4 dims quantizes to 1e10,
    // whose square (1e20) wraps a Long inside dot64/n2, silently
    // corrupting every cosine it touches. The norm-safe bound
    // √(Long.Max/dims)/1e4 (≈1.518e5 at 4 dims) zeroes the whole
    // vector instead, making it inert like any other degenerate input.
    def quantized(vec: Array[Float]): Seq[Long] =
      Seq(0L -> vec).toDF("vec_id", "embedding")
        .select(Similarity.quantize1e4($"embedding").as("q"))
        .as[Seq[Long]].head()
    // over the norm-safe bound (would have passed the old 9e14 guard)
    assert(quantized(v(1e6, 0, 0, 0)) == Seq(0L, 0L, 0L, 0L))
    // just under the bound: stays live, and its norm provably fits —
    // 4 · (1.5e9)² = 9.0e18 < Long.Max
    assert(quantized(v(1.5e5, 1.5e5, 1.5e5, 1.5e5)) ==
      Seq(1500000000L, 1500000000L, 1500000000L, 1500000000L))
    // unit-scale rows are untouched (the gate-row regression guard)
    assert(quantized(v(0.5, -0.25, 0, 1)) == Seq(5000L, -2500L, 0L, 10000L))
  }

  test("loud failure modes: missing index, negative batch id, seedless codebook") {
    val e1 = intercept[IllegalArgumentException] {
      Similarity.admitSemanticDedup(df(b0), tmpDir("graft-semadmit-noidx").toString, 0L)
    }
    assert(e1.getMessage.contains("not a semantic-dedup index"))
    val path = newIndex("graft-semadmit-neg")
    val e2 = intercept[IllegalArgumentException] {
      Similarity.admitSemanticDedup(df(b0), path, -1L)
    }
    assert(e2.getMessage.contains("non-negative"))
    // a reference corpus without vec_id < k trains an empty codebook —
    // that must fail at CREATE time, not silently admit uncompared
    val e3 = intercept[IllegalArgumentException] {
      Similarity.createSemanticDedupIndex(spark,
        tmpDir("graft-semadmit-seedless").toString + "/idx",
        Seq(50L -> v(1, 0, 0, 0)).toDF("vec_id", "embedding"),
        tauMilli = 950L, k = 2, iters = 1)
    }
    graft.CacheScope.drain()
    assert(e3.getMessage.contains("codebook is empty"))
  }
}
