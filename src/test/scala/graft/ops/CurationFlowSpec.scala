package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end curation flow over the library API — the composition a
  * real training-data pipeline runs: benchmark bloom → corpus
  * decontamination → deterministic shard layout, with the counts
  * consistent at every step.
  */
class CurationFlowSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("decontaminate then shard: counts consistent, no contaminated doc survives") {
    import spark.implicits._
    val docs = graft.Tables.t(spark, dir, "documents")
    val bench = docs.filter($"doc_id" % 100 === 0)
    val corpus = docs.filter($"doc_id" % 100 =!= 0)

    val bloom = Dedup.benchmarkBloom(bench)
    assert(bloom.length > 0)
    val clean = Dedup.bloomClean(corpus, bloom).persist()

    // exact contaminated set (shingle equi-join) must be fully removed —
    // the bloom has no false negatives
    val sh = (df: org.apache.spark.sql.DataFrame) =>
      df.select($"doc_id", $"lang", split($"text", " ").as("__ws"))
        .select($"doc_id", $"lang", explode(Dedup.shinglesFromWords($"__ws")).as("wd"))
    val exact = sh(corpus).as("c")
      .join(sh(bench).as("b"),
        col("c.wd") === col("b.wd") && col("c.lang") === col("b.lang"), "left_semi")
      .select(col("doc_id")).distinct()
    val nExact = exact.count()
    val survivors = clean.join(exact, Seq("doc_id"), "left_semi").count()
    assert(survivors == 0, s"$survivors contaminated docs survived cleaning")

    // false positives bounded: at most 0.5% of the corpus + 1 extra drops
    val nCorpus = corpus.count()
    val nClean = clean.count()
    assert(nClean >= nCorpus - nExact - (nCorpus / 200 + 1))

    // shard the cleaned corpus; manifest must account for every row
    val out = tmpDir("curation").toString + "/shards"
    val manifest = Sharding.writeTrainingShards(clean, "doc_id", out, 16)
    assert(manifest.agg(sum($"n_rows")).head().getLong(0) == nClean)
    clean.unpersist()
  }

  test("empty benchmark fails loudly instead of silently cleaning nothing") {
    import spark.implicits._
    val docs = graft.Tables.t(spark, dir, "documents")
    val empty = docs.filter($"doc_id" < 0)
    val e = intercept[IllegalArgumentException] {
      Dedup.benchmarkBloom(empty)
    }
    assert(e.getMessage.contains("no shingles"))
    intercept[IllegalArgumentException] {
      Dedup.bloomClean(docs, null)
    }
  }

  test("benchmarkBloom sizing is caller-controllable (deployment-scale filters)") {
    import spark.implicits._
    val docs = graft.Tables.t(spark, dir, "documents")
    val bench = docs.filter($"doc_id" % 100 === 0)
    // a bigger filter must still have no false negatives; size scales with bits
    val small = Dedup.benchmarkBloom(bench, estItems = 10000L, numBits = 400000L)
    val big = Dedup.benchmarkBloom(bench, estItems = 1000000L, numBits = 40000000L)
    assert(big.length > small.length)
    val corpus = docs.filter($"doc_id" % 100 =!= 0)
    val cleanBig = Dedup.bloomClean(corpus, big)
    val cleanSmall = Dedup.bloomClean(corpus, small)
    // bigger filter ⇒ fewer false positives ⇒ at least as many survivors
    assert(cleanBig.count() >= cleanSmall.count())
  }
}
