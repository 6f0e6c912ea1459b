package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.Row

/** Structured Streaming surface (SURVEY.md §2.B "Streaming"). The
  * reference has no streaming — its closest analog is the 30 s polling
  * scheduler (scheduler/scheduler.py:49-56). These transformations are
  * the streaming twins of ops.EventOps (same logic, verified against
  * the DuckDB oracle there in batch); specs drive them with
  * MemoryStream. At scale: state is keyed by (window/user) — watermarks
  * bound state size, which is what makes the 100 TB/day version viable.
  */
object StreamOps {

  final case class Event(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  final case class UserSession(
      user_id: Long, start: java.sql.Timestamp, end: java.sql.Timestamp,
      n_events: Long, sum_value: Double)

  /** flatMapGroupsWithState accumulator for [[statefulSessions]]. */
  final case class Agg(start: Long, end: Long, n: Long, sum: Double)

  /** Tumbling 10-minute counts with a 10-minute watermark: late rows
    * beyond the watermark are dropped, per-window state is evicted once
    * the watermark passes the window end.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))

  /** Session windows (5-minute gap) per user — streaming twin of
    * ops.EventOps.sessionize.
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("sess_start"),
        col("w.end").as("sess_end"), col("n_events"))

  /** Streaming dedup on event_id within the watermark horizon. */
  def dedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes").dropDuplicates("event_id")

  /** Stream-static join: enrich the stream with a static dimension. */
  def enrich(events: DataFrame, dim: DataFrame, streamKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), col(streamKey) === col(dimKey))

  /** Stream-stream inner join with watermarks on BOTH sides and an
    * event-time interval condition — the attribution shape: each
    * purchase joins the same user's clicks from the preceding
    * `windowMinutes`. The interval bound + both watermarks are what let
    * Spark evict buffered join state (without them a stream-stream join
    * holds both streams forever); state is keyed by user and bounded by
    * watermark + range, the 100 TB/day-viable shape. Batch twin with
    * the DuckDB oracle: ops.EventOps.attribution (q_evt_attribution);
    * StreamOpsSpec drives this one with MemoryStream and asserts parity
    * with the batch twin.
    */
  def attributeClicks(clicks: DataFrame, purchases: DataFrame, windowMinutes: Int): DataFrame = {
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("click_ts") <= col("purchase_ts"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("purchase_ts"),
        col("click_id"), col("click_ts"))
  }

  /** Custom stateful sessionization via flatMapGroupsWithState with
    * event-time timeout — the escape hatch when session_window's
    * semantics aren't enough (emits a session only when it closes).
    */
  def statefulSessions(spark: SparkSession, events: DataFrame, gapMs: Long): DataFrame = {
    import spark.implicits._
    events.as[Event]
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Agg, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[Agg]) =>
          if (state.hasTimedOut) {
            val a = state.get
            state.remove()
            Iterator.single(UserSession(userId,
              new java.sql.Timestamp(a.start), new java.sql.Timestamp(a.end + gapMs),
              a.n, a.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var acc = state.getOption
            val closed = Seq.newBuilder[UserSession]
            sorted.foreach { e =>
              val t = e.ts.getTime
              acc match {
                case Some(a) if t - a.end < gapMs =>
                  acc = Some(Agg(a.start, t max a.end, a.n + 1, a.sum + e.value))
                case Some(a) =>
                  closed += UserSession(userId, new java.sql.Timestamp(a.start),
                    new java.sql.Timestamp(a.end + gapMs), a.n, a.sum)
                  acc = Some(Agg(t, t, 1, e.value))
                case None =>
                  acc = Some(Agg(t, t, 1, e.value))
              }
            }
            acc.foreach { a =>
              state.update(a)
              state.setTimeoutTimestamp(a.end + gapMs)
            }
            closed.result().iterator
          }
      }.toDF()
  }

  /** foreachBatch sink that reuses the batch load path (SURVEY.md §2.B
    * "Output modes/sinks": reuse batch loaders A7-A9 inside).
    */
  def toForeachBatch(df: DataFrame, outputMode: String)(
      loadBatch: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    df.writeStream
      .outputMode(outputMode)
      .foreachBatch((batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
        loadBatch(batch.toDF(), id))

  /** Streaming CDC-style upsert into a parquet target — each
    * micro-batch MERGEs into the current snapshot on `keyCol` (last
    * write per key wins; within one batch the row with the highest
    * `versionCol` wins, so out-of-order CDC events inside a batch
    * still resolve deterministically) and atomically swaps the
    * snapshot directory. Plain parquet has no transactional row
    * rewrite, so the honest shape is rewrite-merge-swap: read current
    * ∪ dedup batch → anti-join old keys → write NEW dir → rename. On
    * a 100 TB target you'd bucket the snapshot by the merge key so
    * the per-batch merge touches only colliding buckets; here the
    * whole-snapshot rewrite is explicit and documented, not hidden.
    */
  def upsertToParquet(df: DataFrame, keyCol: String, versionCol: String,
      targetDir: String): DataStreamWriter[Row] =
    toForeachBatch(df, "append")((batch, _) =>
      mergeIntoSnapshot(batch, keyCol, versionCol, targetDir))

  /** The per-batch merge of [[upsertToParquet]], callable directly
    * (bench harnesses, backfills replaying batches without a stream).
    */
  private[graft] def mergeIntoSnapshot(batch: DataFrame, keyCol: String,
      versionCol: String, targetDir: String): Unit = {
      val spark = batch.sparkSession
      import org.apache.spark.sql.expressions.Window
      val latest = batch
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col(keyCol)).orderBy(col(versionCol).desc)))
        .filter(col("__rn") === 1).drop("__rn")
      val cur = new java.io.File(targetDir, "current")
      val prev = new java.io.File(targetDir, "prev")
      // crash recovery: a previous batch that died between its two
      // renames left no "current" but a complete "prev" — restore it
      // before merging, or the accumulated table would be silently
      // dropped (foreachBatch may replay the batch after a failure,
      // which is exactly when this state occurs)
      if (!cur.isDirectory && prev.isDirectory)
        require(prev.renameTo(cur), s"upsert recovery rename failed in $targetDir")
      val merged =
        if (cur.isDirectory) {
          val old = spark.read.parquet(cur.getPath)
          old.join(latest.select(col(keyCol)), Seq(keyCol), "left_anti")
            .unionByName(latest)
        } else latest
      val next = new java.io.File(targetDir, "next")
      merged.write.mode("overwrite").parquet(next.getPath)
      // swap, every step checked: a silently-failed rename here would
      // let streaming commit the batch offsets while readers keep the
      // stale snapshot — the batch would be lost with no error
      if (prev.isDirectory) org.apache.commons.io.FileUtils.deleteDirectory(prev)
      if (cur.isDirectory)
        require(cur.renameTo(prev), s"upsert swap (current→prev) failed in $targetDir")
      if (!next.renameTo(cur)) {
        // roll the old snapshot back so readers/next batch still see it
        if (prev.isDirectory) { val _ = prev.renameTo(cur) }
        throw new IllegalStateException(s"upsert swap (next→current) failed in $targetDir")
      }
  }

  /** Bucketed streaming CDC upsert — the partition-pruned upgrade path
    * of [[upsertToParquet]], whose merge-rewrite-swap rewrites the FULL
    * snapshot every micro-batch (O(snapshot) per batch, its documented
    * cost). Here the snapshot is laid out as `bucket=<b>/current`
    * directories with b = pmod(hash(key), numBuckets); each batch
    *
    *  1. restores any bucket a crash left mid-swap (prev/ without
    *     current/ — same recovery invariant as the unbucketed sink,
    *     now per bucket; an O(numBuckets) directory sweep),
    *  2. resolves in-batch versions (highest `versionCol` per key),
    *  3. reads ONLY the buckets the batch's keys hash into — the
    *     partition pruning: untouched buckets are never read, never
    *     rewritten, their files never move,
    *  4. anti-joins replaced keys out, unions the batch in, writes the
    *     merged touched buckets to a staging dir in ONE job
    *     (`partitionBy(__bucket)`), and
    *  5. swaps each touched bucket with the same checked
    *     current→prev→next rename dance, so readers see per-bucket
    *     atomicity and a crash anywhere replays idempotently
    *     (re-merging the same batch is a no-op by key).
    *
    * Per-batch cost drops from O(snapshot) to O(batch + touched-bucket
    * bytes) ≈ snapshot·min(1, |batch keys| / numBuckets): at 100 TB
    * with 100k buckets a 10k-key CDC batch rewrites ≤ 0.01 % of the
    * table. The driver-side bucket list is bounded by numBuckets — a
    * constant, not data volume. The remaining gap to a real table
    * format (Iceberg/Delta) is multi-bucket transactionality: a reader
    * listing during the swap loop can see bucket A new and bucket B
    * old; per-key consistency still holds because a key lives in
    * exactly one bucket.
    */
  def upsertToParquetBucketed(df: DataFrame, keyCol: String, versionCol: String,
      targetDir: String, numBuckets: Int): DataStreamWriter[Row] =
    toForeachBatch(df, "append")((batch, _) =>
      mergeIntoBucketedSnapshot(batch, keyCol, versionCol, targetDir, numBuckets))

  /** The per-batch merge of [[upsertToParquetBucketed]], callable
    * directly. */
  private[graft] def mergeIntoBucketedSnapshot(batch: DataFrame, keyCol: String,
      versionCol: String, targetDir: String, numBuckets: Int): Unit = {
    val spark = batch.sparkSession
    import org.apache.spark.sql.expressions.Window
    val root = new java.io.File(targetDir)
    root.mkdirs()
    // 0. bucket-count contract: routing is pure hash(key) mod N, so a
    // DIFFERENT N against an existing snapshot silently re-routes rows
    // read from touched buckets into staged buckets the swap loop never
    // installs — permanent row loss. Persist N on first write and fail
    // fast on any mismatch instead.
    val marker = new java.io.File(root, "_num_buckets")
    if (marker.isFile) {
      val stored = new String(
        java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8").trim.toInt
      require(stored == numBuckets,
        s"bucketed snapshot at $targetDir was written with numBuckets=$stored; " +
          s"got $numBuckets — changing the bucket count requires a full rewrite")
    } else {
      java.nio.file.Files.write(marker.toPath,
        numBuckets.toString.getBytes("UTF-8"))
    }
    // 1. crash-recovery sweep over bucket dirs
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("bucket=")).foreach { bd =>
        val cur = new java.io.File(bd, "current")
        val prev = new java.io.File(bd, "prev")
        if (!cur.isDirectory && prev.isDirectory)
          require(prev.renameTo(cur), s"bucketed upsert recovery rename failed in $bd")
      }
    // 2. in-batch version resolution + bucket assignment
    val latest = batch
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col(versionCol).desc)))
      .filter(col("__rn") === 1).drop("__rn")
      .withColumn("__bucket", pmod(hash(col(keyCol)), lit(numBuckets)))
      .persist()
    // 3. touched buckets only — bounded by numBuckets, never by data
    val touched = latest.select("__bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    val existing = touched
      .map(b => new java.io.File(root, s"bucket=$b/current"))
      .filter(_.isDirectory).map(_.getPath)
    // 4. merge + one staged write of the touched buckets. The bucket
    // column is RECOMPUTED from the key on read (partition dirs don't
    // store it), keeping bucket routing a pure function of the key.
    val merged =
      if (existing.isEmpty) latest
      else spark.read.parquet(existing.toIndexedSeq: _*)
        .withColumn("__bucket", pmod(hash(col(keyCol)), lit(numBuckets)))
        .join(latest.select(col(keyCol)), Seq(keyCol), "left_anti")
        .unionByName(latest)
    val staging = new java.io.File(root, "staging")
    if (staging.isDirectory) org.apache.commons.io.FileUtils.deleteDirectory(staging)
    merged.select(latest.columns.map(col).toIndexedSeq: _*)
      .write.mode("overwrite").partitionBy("__bucket").parquet(staging.getPath)
    latest.unpersist()
    // 5. per-bucket checked swap
    touched.foreach { b =>
      val next = new java.io.File(staging, s"__bucket=$b")
      require(next.isDirectory, s"staged bucket $b missing under $staging")
      val bd = new java.io.File(root, s"bucket=$b")
      bd.mkdirs()
      val cur = new java.io.File(bd, "current")
      val prev = new java.io.File(bd, "prev")
      if (prev.isDirectory) org.apache.commons.io.FileUtils.deleteDirectory(prev)
      if (cur.isDirectory)
        require(cur.renameTo(prev), s"bucketed upsert swap (current→prev) failed in $bd")
      if (!next.renameTo(cur)) {
        if (prev.isDirectory) { val _ = prev.renameTo(cur) }
        throw new IllegalStateException(s"bucketed upsert swap (next→current) failed in $bd")
      }
    }
    org.apache.commons.io.FileUtils.deleteDirectory(staging)
  }

  /** Read the current state of a [[upsertToParquetBucketed]] target:
    * the union of every bucket's `current` snapshot. */
  def readBucketedSnapshot(spark: SparkSession, targetDir: String): DataFrame = {
    val dirs = Option(new java.io.File(targetDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .map(bd => new java.io.File(bd, "current"))
      .filter(_.isDirectory).map(_.getPath)
    require(dirs.nonEmpty, s"no bucket snapshots under $targetDir")
    spark.read.parquet(dirs.toIndexedSeq: _*)
  }
}
