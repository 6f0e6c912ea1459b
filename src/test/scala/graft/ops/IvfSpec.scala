package graft.ops

import graft.SparkSpec

/** IVF ANN quality gate: the trained-codebook inverted-list search must
  * recover a meaningful fraction of the exact brute-force top-3 —
  * recall far above chance (3/N ≈ 0.3% at sf0.01) proves the k-means
  * codebook actually clusters and the probes land in the right lists.
  * (Recall is bounded well below 1.0 here by construction: the fixture
  * embeddings are isotropic random vectors, the hardest case for any
  * space-partitioning index.)
  */
class IvfSpec extends SparkSpec {

  test("trained-codebook IVF recall@3 vs brute force is far above chance") {
    val dir = "/root/testdata/sf0.01"
    val bf = Similarity.bruteForceTopK(spark, dir)
      .filter("rank <= 3")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivf(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bf.nonEmpty && ivf.nonEmpty)
    val recall = (ivf & bf).size.toDouble / bf.size
    assert(recall >= 0.3, f"recall@3 $recall%.2f below 0.3 — codebook not clustering")
  }
}
