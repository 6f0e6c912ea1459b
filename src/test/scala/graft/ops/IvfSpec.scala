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

  test("recall@3 is monotonically non-decreasing in nprobe (1, 2, 4)") {
    // documents the recall/cost curve: widening the probe set can only
    // add candidate lists, so recall must not drop — and by nprobe=4
    // (a quarter of the k=16 codebook) it should be well clear of the
    // nprobe=1 floor
    val dir = "/root/testdata/sf0.01"
    val bf = Similarity.bruteForceTopK(spark, dir)
      .filter("rank <= 3")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalls = Seq(1, 2, 4).map { np =>
      val got = Similarity.ivfWithNprobe(spark, dir, np)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      np -> (got & bf).size.toDouble / bf.size
    }
    recalls.sliding(2).foreach { case Seq((np1, r1), (np2, r2)) =>
      assert(r2 >= r1, f"recall dropped $r1%.2f@$np1 → $r2%.2f@$np2")
    }
    assert(recalls.last._2 > recalls.head._2,
      s"recall flat across nprobe 1→4: $recalls — probes not adding lists")
  }

  test("k=64 codebook at the same probed fraction keeps the k=16 recall floor") {
    // deployment-scale knob check: 4× more (finer) lists probed at the
    // same corpus fraction (nprobe/k = 1/8) must not collapse recall —
    // finer partitioning narrows each list without losing the near
    // neighbors the coarse codebook found
    val dir = "/root/testdata/sf0.01"
    val bf = Similarity.bruteForceTopK(spark, dir)
      .filter("rank <= 3")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val coarse = Similarity.ivfWithParams(spark, dir, 16, 2, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fine = Similarity.ivfWithParams(spark, dir, 64, 2, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rCoarse = (coarse & bf).size.toDouble / bf.size
    val rFine = (fine & bf).size.toDouble / bf.size
    info(f"recall@3 k=16/np=2: $rCoarse%.2f  k=64/np=8: $rFine%.2f")
    assert(rFine >= rCoarse,
      f"finer codebook lost recall: $rFine%.2f < $rCoarse%.2f at the same probed fraction")
    assert(rFine >= 0.3, f"k=64 recall $rFine%.2f below the 0.3 floor")
  }
}
