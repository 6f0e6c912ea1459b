package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** Measures the per-batch cost of the two streaming CDC upsert sinks
  * (PLANS.md "CDC upsert rewrite cost"): the full-rewrite
  * merge-swap ([[StreamOps.mergeIntoSnapshot]], O(snapshot) per batch
  * by design) against the bucketed partition-pruned variant
  * ([[StreamOps.mergeIntoBucketedSnapshot]], O(touched buckets)).
  *
  * Two phases over the events fixture, calling the extracted per-batch
  * merges directly (same code the foreachBatch sinks run, minus
  * stream scheduling noise):
  *
  *  - growth: `gBatches` disjoint-key batches (hash-sliced event_ids)
  *    accumulate into the snapshot — the rewrite-cost CURVE as the
  *    snapshot grows from 0 to all rows;
  *  - update: small batches (`uKeys` keys re-sent with bumped
  *    versions) against the full snapshot — steady-state CDC, where
  *    bucket pruning pays: the full variant still rewrites everything,
  *    the bucketed one only the ≤ uKeys buckets its keys hash into.
  *
  * Per batch it reports seconds AND parquet bytes (re)written — bytes
  * are the scale-free number: at this fixture size job-setup constants
  * dominate seconds, but the bytes ratio is exactly the I/O a 100 TB
  * cluster would save.
  *
  * Usage: UpsertBench <sfDir> <workDir> [gBatches=5] [uBatches=5] [uKeys=50] [numBuckets=256]
  */
object UpsertBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val work = args(1)
    val gBatches = if (args.length > 2) args(2).toInt else 5
    val uBatches = if (args.length > 3) args(3).toInt else 5
    val uKeys = if (args.length > 4) args(4).toInt else 50
    val numBuckets = if (args.length > 5) args(5).toInt else 256
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val events = graft.Tables.t(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("version"))
      .persist()
    events.count()

    def bytesUnder(dir: java.io.File, newerThan: Long): Long = {
      val kids = Option(dir.listFiles()).getOrElse(Array.empty)
      kids.map {
        case d if d.isDirectory => bytesUnder(d, newerThan)
        case f if f.getName.endsWith(".parquet") && f.lastModified() >= newerThan => f.length()
        case _ => 0L
      }.sum
    }

    /** Run one merge, returning (seconds, bytes written by it). */
    def timed(target: String)(merge: => Unit): (Double, Long) = {
      val t0wall = System.currentTimeMillis()
      val t0 = System.nanoTime()
      merge
      val dt = (System.nanoTime() - t0) / 1e9
      (dt, bytesUnder(new java.io.File(target), t0wall))
    }

    def growthBatch(r: Int): DataFrame =
      events.filter(pmod(hash(col("event_id")), lit(gBatches)) === r)
    // update batches: uKeys stable keys per batch, versions bumped past
    // every fixture timestamp so the update always wins
    def updateBatch(r: Int): DataFrame =
      events.filter(pmod(hash(col("event_id"), lit(r)), lit(10000)) < lit(1))
        .orderBy("event_id").limit(uKeys) // deterministic pick: both variants must see identical batches
        .withColumn("version", col("version") + lit(10000000000000L))

    def runVariant(tag: String, target: String)(merge: DataFrame => Unit): String = {
      val g = (0 until gBatches).map { r =>
        val (s, b) = timed(target)(merge(growthBatch(r)))
        println(f"[$tag] growth $r: $s%.2f s, ${b / 1e6}%.1f MB")
        (s, b)
      }
      val u = (0 until uBatches).map { r =>
        val (s, b) = timed(target)(merge(updateBatch(r)))
        println(f"[$tag] update $r: $s%.2f s, ${b / 1e6}%.1f MB")
        (s, b)
      }
      def arr(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
      s""""${tag}":{"growth_sec":${arr(g.map(_._1))},"growth_mb":${arr(g.map(_._2 / 1e6))},""" +
        s""""update_sec":${arr(u.map(_._1))},"update_mb":${arr(u.map(_._2 / 1e6))}}"""
    }

    val fullDir = s"$work/full"
    val bucketedDir = s"$work/bucketed"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
    val full = runVariant("full", fullDir)(b =>
      StreamOps.mergeIntoSnapshot(b, "event_id", "version", fullDir))
    val bucketed = runVariant("bucketed", bucketedDir)(b =>
      StreamOps.mergeIntoBucketedSnapshot(b, "event_id", "version", bucketedDir, numBuckets))

    // sanity: both variants must converge to the identical snapshot
    val a = spark.read.parquet(s"$fullDir/current")
    val c = StreamOps.readBucketedSnapshot(spark, bucketedDir)
      .select(a.columns.map(col).toIndexedSeq: _*)
    val nA = a.count(); val nC = c.count()
    val diff = a.exceptAll(c).count() + c.exceptAll(a).count()
    require(diff == 0 && nA == nC, s"variant snapshots diverged: $nA vs $nC, diff $diff")

    println(s"""{"bench":"upsert","sf":"$sfDir","rows":${events.count()},""" +
      s""""num_buckets":$numBuckets,"u_keys":$uKeys,$full,$bucketed,"snapshot_rows":$nA}""")
    spark.stop()
  }
}
