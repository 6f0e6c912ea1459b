package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Prefix-index serving split: build → save/append → probe. Pins the
  * three claims: the probe is bit-identical to the fused catalog row
  * (incl. through a parquet round-trip of the index), append ≡ full
  * rebuild (encoding is a pure per-row function), and the index is
  * physically smaller to scan than the corpus — the byte-compression
  * trade the operator exists for, measured, not asserted in prose.
  */
class PrefixIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"
  private def emb = graft.Tables.t(spark, dir, "embeddings")
  private def queries = emb.filter($"vec_id" % 50 === 0)

  private def asTuples(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet

  test("probe over a parquet-round-tripped index == the fused catalog row") {
    val fused = asTuples(Similarity.prefixTopK(spark, dir))
    graft.CacheScope.drain()
    val path = tmpDir("prefix-index").resolve("idx").toString
    Similarity.savePrefixIndex(Similarity.buildPrefixIndex(spark, emb), path)
    graft.CacheScope.drain()
    val served = asTuples(Similarity.probePrefixIndex(
      spark, emb, queries, spark.read.parquet(path)))
    assert(fused.nonEmpty && served == fused,
      s"served diverged: missing=${(fused -- served).take(5)} extra=${(served -- fused).take(5)}")
  }

  test("append == full rebuild, row for row") {
    val base = tmpDir("prefix-append")
    val full = base.resolve("full").toString
    val inc = base.resolve("inc").toString
    Similarity.savePrefixIndex(Similarity.buildPrefixIndex(spark, emb), full)
    graft.CacheScope.drain()
    Similarity.savePrefixIndex(
      Similarity.buildPrefixIndex(spark, emb.filter($"vec_id" < 250)), inc)
    graft.CacheScope.drain()
    Similarity.appendPrefixIndex(
      Similarity.buildPrefixIndex(spark, emb.filter($"vec_id" >= 250)), inc)
    graft.CacheScope.drain()
    def rows(p: String) = spark.read.parquet(p)
      .select($"vec_id", concat_ws(",", $"pq".cast("array<string>")), $"pn2")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows(inc) == rows(full))
  }

  test("full-dim index (no truncation) equals brute force even with a tiny shortlist") {
    // dims = the corpus dimension → stage-1 cosine IS the exact
    // cosine, so the top-shortlist head necessarily contains the true
    // top-k and the rescore returns exactly brute force. Pins the
    // rescore machinery's correctness independent of truncation loss.
    val dir = tmpDir("prefix-fulldim").toString
    val rnd = new scala.util.Random(29)
    (0L until 150L).map(id => (id, Array.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val corpus = graft.Tables.t(spark, dir, "embeddings")
    val exact = Similarity.bruteForceTopK(spark, dir).filter($"rank" <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    graft.CacheScope.drain()
    val got = asTuples(Similarity.probePrefixIndex(
      spark, corpus, corpus.filter($"vec_id" % 50 === 0),
      Similarity.buildPrefixIndex(spark, corpus, dims = 64),
      dims = 64, shortlist = 4))
    assert(exact.nonEmpty && got == exact,
      s"missing=${(exact -- got).take(5)} extra=${(got -- exact).take(5)}")
  }

  test("streaming ingest: foreachBatch index-append, probes see every arrival") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = tmpDir("prefix-stream-index").toString + "/index"
    // bootstrap with 3/5 of the corpus, stream the rest in two batches
    Similarity.savePrefixIndex(
      Similarity.buildPrefixIndex(spark, emb.filter($"vec_id" % 5 > 1)), path)
    graft.CacheScope.drain()
    val rows = emb.filter($"vec_id" % 5 <= 1)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        Similarity.appendPrefixIndex(Similarity.buildPrefixIndex(
          spark, b.withColumn("embedding", col("embedding").cast("array<float>"))), path)
      }
      .option("checkpointLocation", tmpDir("prefix-stream-ck").toString)
      .start()
    try {
      mem.addData(rows.take(rows.length / 2)); q.processAllAvailable()
      mem.addData(rows.drop(rows.length / 2)); q.processAllAvailable()
    } finally q.stop()
    graft.CacheScope.drain()
    val streamed = asTuples(Similarity.probePrefixIndex(
      spark, emb, queries, spark.read.parquet(path)))
    graft.CacheScope.drain()
    val rebuilt = asTuples(Similarity.probePrefixIndex(
      spark, emb, queries, Similarity.buildPrefixIndex(spark, emb)))
    assert(streamed == rebuilt && streamed.nonEmpty)
  }

  test("scanning the index reads a fraction of the corpus bytes") {
    // the 500-row fixture is footer-dominated; the byte claim needs a
    // corpus where data pages dominate — 20k incompressible vectors
    val base = tmpDir("prefix-bytes")
    val corpusPath = base.resolve("emb").toString
    val rnd = new scala.util.Random(11)
    (0L until 20000L).map(id => (id, Array.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
      .repartition(4).write.parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    val path = base.resolve("idx").toString
    Similarity.savePrefixIndex(Similarity.buildPrefixIndex(spark, corpus), path)
    graft.CacheScope.drain()
    // on-disk bytes, not inputMetrics.bytesRead: the vectorized parquet
    // reader under-reports bytesRead for array columns by ~250× (5.2 MB
    // corpus reported as 20 KB — measured while writing this test), so
    // the listener number is unusable here. Disk size IS the physical
    // claim: it is what a stage-1 scan reads and what the index costs
    // to store.
    def diskBytes(p: String): Long = java.nio.file.Files.walk(
      java.nio.file.Paths.get(p)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(java.nio.file.Files.size(_)).sum
    val idxB = diskBytes(path)
    val fullB = diskBytes(corpusPath)
    assert(idxB > 0 && fullB > 0)
    assert(idxB * 2 < fullB,
      s"index $idxB B not < half of corpus $fullB B")
  }
}
