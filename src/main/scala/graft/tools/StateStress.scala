package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming-state stress harness — the measurement behind the round-10
  * RocksDB default (`streaming/StreamingLoad.resolveStateStore`): the
  * HDFS-backed provider keeps every state row on the executor HEAP, so
  * total state is capped by executor memory; RocksDB keeps state in
  * native memory + local disk and sustains state far past the heap.
  *
  * The stress is streaming dedup with NO watermark (unbounded state —
  * one state row per distinct key, the worst case a landing-zone dedup
  * degrades to when event ids never repeat): a MemoryStream feeds
  * batches of fresh wide keys, so state grows by exactly `batch` rows
  * per micro-batch. Run the SAME workload in two JVMs — one per
  * provider — under a deliberately small heap (`SPARK_DRIVER_MEM`):
  * the heap-backed provider dies with OOM once the state map outgrows
  * the heap; RocksDB finishes, and its progress line reports how little
  * JVM memory the state held (`memoryUsedBytes` ≈ metadata only).
  *
  * One JSON line per micro-batch: state rows so far, provider-reported
  * state bytes, cumulative ingest rows/s. Final line `"done"` with
  * totals — its absence + nonzero exit IS the OOM result (run with
  * SPARK_GRAFT_OOM_EXIT=1 so the forked JVM gets
  * -XX:+ExitOnOutOfMemoryError and the failure is fast and clean
  * instead of a GC thrash; the flag is opt-in so ordinary test JVMs
  * keep their normal OutOfMemoryError stack traces).
  *
  * Usage: SPARK_GRAFT_OOM_EXIT=1 SPARK_DRIVER_MEM=700m
  *        sbt "runMain graft.tools.StateStress <hdfs|rocksdb> <nKeys> [batch=250000] [keyLen=80]"
  */
object StateStress {
  def main(args: Array[String]): Unit = {
    val providerArg = args(0)
    val nKeys = args(1).toLong
    val batch = if (args.length > 2) args(2).toLong else 250000L
    val keyLen = if (args.length > 3) args(3).toInt else 80
    val provider = providerArg match {
      case "rocksdb" =>
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
      case "hdfs" =>
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
      case other => throw new IllegalArgumentException(
        s"provider must be hdfs | rocksdb, got '$other'")
    }
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.streaming.stateStore.providerClass", provider)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ck = java.nio.file.Files.createTempDirectory("state-stress-ck").toString
    val pad = "x" * keyLen
    val in = MemoryStream[Long]
    // wide distinct key per row -> one state row per input row, forever
    val deduped = in.toDF()
      .select(concat($"value".cast("string"), lit("#"), lit(pad)).as("key"))
      .dropDuplicates("key")
    val q = deduped.writeStream
      .format("noop")
      .option("checkpointLocation", ck)
      .outputMode("append")
      .start()

    val t0 = System.nanoTime()
    var added = 0L
    while (added < nKeys) {
      val n = math.min(batch, nKeys - added)
      in.addData(added until (added + n))
      added += n
      q.processAllAvailable()
      val p = q.lastProgress
      val so = p.stateOperators(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"tool":"state_stress","provider":"$providerArg","state_rows":${so.numRowsTotal},"state_bytes":${so.memoryUsedBytes},"ingested":$added,"sec":$sec%.1f,"rows_per_sec":${(added / sec).toLong}}""")
    }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"tool":"state_stress","provider":"$providerArg","done":true,"heap_mb":${Runtime.getRuntime.maxMemory() / (1024 * 1024)},"n_keys":$nKeys,"key_len":$keyLen,"sec":$sec%.1f,"rows_per_sec":${(nKeys / sec).toLong}}""")
    q.stop()
    spark.stop()
  }
}
