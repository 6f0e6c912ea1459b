package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index-growth sweep for the BM25 inverted index
  * (`graft.ops.TextAnalysis.maintainBm25Index`): append `ticks`
  * fixed-size corpus batches and per tick print BOTH costs that
  * matter at deployment — the maintain wall (must track the BATCH:
  * the append never reads existing generations, so a growing index
  * must not slow ingestion) and the serve wall for a FIXED query
  * batch (must track the query footprint: the postings/dfreq reads
  * prune to the batch's buckets and terms, but each accumulated
  * GENERATION adds listing + footer rent, which is exactly what
  * `compactBm25Index` exists to bound).
  *
  * The AdmitSweep discipline: deterministic hash-text batches,
  * compaction untimed (scheduled maintenance, not ingestion cost),
  * flatness verdict = mean(last 5) / mean(ticks 2-6) per series.
  *
  * Usage: Bm25MaintainSweep [ticks=20] [batchDocs=2000] [docTokens=40] [compactEvery=0]
  *   (env: SPARK_GRAFT_CPUS)
  */
object Bm25MaintainSweep {

  def main(args: Array[String]): Unit = {
    val ticks = if (args.length > 0) args(0).toInt else 20
    val batchDocs = if (args.length > 1) args(1).toInt else 2000
    val docTokens = if (args.length > 2) args(2).toInt else 40
    val compactEvery = if (args.length > 3) args(3).toInt else 0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("graft-bm25-sweep")
    val idx = s"$base/idx"

    // deterministic batches over a 40k-term pool (AdmitSweep's
    // convention) — disjoint doc_id ranges, the append contract
    def batchDf(tick: Int): DataFrame = {
      val lo = tick.toLong * batchDocs
      spark.range(lo, lo + batchDocs).toDF("doc_id")
        .withColumn("text", concat_ws(" ",
          (0 until docTokens).map(p =>
            concat(lit("w"), pmod(xxhash64(col("doc_id") * 7919L + p), lit(40000L)))): _*))
    }
    // FIXED serving batch: 25 docs from tick 0 — the serve series
    // must measure index growth, never a growing query set
    val queries = batchDf(0).filter($"doc_id" % 83 === 3).limit(25)
      .selectExpr("doc_id AS query_id",
        "explode(slice(split(text, ' '), 1, 8)) AS term").distinct()
      .persist()
    queries.count()

    val out = new StringBuilder
    (0 until ticks).foreach { t =>
      val b = batchDf(t)
      val t0 = System.nanoTime()
      graft.ops.TextAnalysis.maintainBm25Index(b, idx, t.toLong)
      val maintainSec = (System.nanoTime() - t0) / 1e9
      graft.CacheScope.drain()
      val t1 = System.nanoTime()
      val served = graft.ops.TextAnalysis.bm25Serve(spark, queries, idx).count()
      val serveSec = (System.nanoTime() - t1) / 1e9
      graft.CacheScope.drain()
      spark.sharedState.cacheManager.clearCache()
      val line = f"""{"tick":$t,"maintain_sec":$maintainSec%.3f,"serve_sec":$serveSec%.3f,"served_rows":$served,"batch":$batchDocs}"""
      println(line)
      out.append(line).append('\n')
      if (compactEvery > 0 && t % compactEvery == compactEvery - 1) {
        val folded = graft.ops.TextAnalysis.compactBm25Index(spark, idx)
        println(s"""{"compacted_after_tick":$t,"folded":$folded}""")
      }
    }
    def growth(tag: String): Unit = {
      val secs = out.toString.linesIterator.toSeq.map { l =>
        (s""""$tag":([0-9.]+)""").r.findFirstMatchIn(l).get.group(1).toDouble
      }
      if (ticks >= 10) {
        val early = secs.slice(2, 7).sum / 5
        val late = secs.takeRight(5).sum / 5
        println(f"""{"series":"$tag","early_mean":$early%.3f,"late_mean":$late%.3f,"growth":${late / early}%.3f}""")
      }
    }
    growth("maintain_sec")
    growth("serve_sec")
    spark.stop()
  }
}
