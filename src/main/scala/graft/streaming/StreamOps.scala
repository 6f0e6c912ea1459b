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
    toForeachBatch(df, "append") { (batch, _) =>
      val spark = batch.sparkSession
      import org.apache.spark.sql.functions._
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
}
