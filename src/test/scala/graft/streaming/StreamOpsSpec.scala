package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.functions.{broadcast, col}
import java.sql.Timestamp

/** Streaming tests (SURVEY.md §5.5): MemoryStream with events-schema
  * rows, watermark/late-data behavior, streaming dedup, foreachBatch
  * reuse, stateful sessions.
  */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._
  import StreamOps.Event

  private def ev(id: Long, t: String, user: Long, typ: String, v: Double) =
    Event(id, Timestamp.valueOf(t), user, typ, v, "{}")

  private def runBatches[A](stream: MemoryStream[Event], query: org.apache.spark.sql.DataFrame,
      mode: OutputMode, batches: Seq[Seq[Event]]): Seq[org.apache.spark.sql.Row] = {
    val name = s"mem_${System.nanoTime()}"
    val q = query.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  test("tumbling window counts with watermark drops too-late rows") {
    val mem = MemoryStream[Event](spark)
    val out = runBatches(mem, StreamOps.tumblingCounts(mem.toDF()), OutputMode.Append, Seq(
      Seq(ev(1, "2024-01-01 00:01:00", 1, "click", 1.0),
        ev(2, "2024-01-01 00:05:00", 1, "click", 1.0)),
      // advance watermark far past the first window → it closes+emits
      Seq(ev(3, "2024-01-01 01:00:00", 1, "click", 1.0)),
      // this event is >10min behind the watermark → dropped
      Seq(ev(4, "2024-01-01 00:02:00", 1, "click", 99.0)),
      Seq(ev(5, "2024-01-01 02:00:00", 1, "click", 1.0))))
    val firstWindow = out.filter(_.getTimestamp(0) == Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(firstWindow.map(_.getLong(2)).sum == 2) // late event 4 NOT counted
  }

  test("streaming dedup on event_id") {
    val mem = MemoryStream[Event](spark)
    val out = runBatches(mem, StreamOps.dedup(mem.toDF()), OutputMode.Append, Seq(
      Seq(ev(1, "2024-01-01 00:01:00", 1, "click", 1.0)),
      Seq(ev(1, "2024-01-01 00:01:00", 1, "click", 1.0), // duplicate id
        ev(2, "2024-01-01 00:02:00", 1, "view", 2.0))))
    assert(out.map(_.getLong(0)).sorted == Seq(1L, 2L))
  }

  test("stateful sessions emit on gap timeout with correct bounds") {
    val mem = MemoryStream[Event](spark)
    val out = runBatches(mem,
      StreamOps.statefulSessions(spark, mem.toDF(), gapMs = 5 * 60 * 1000),
      OutputMode.Append, Seq(
        Seq(ev(1, "2024-01-01 00:00:00", 7, "a", 1.0),
          ev(2, "2024-01-01 00:02:00", 7, "a", 2.0)),
        // a second burst >gap later closes session 1 within-batch
        Seq(ev(3, "2024-01-01 00:30:00", 7, "a", 3.0)),
        // push watermark forward so the timeout fires for session 2
        Seq(ev(4, "2024-01-01 03:00:00", 8, "b", 0.0))))
    val sessions = out.filter(_.getLong(0) == 7L)
    assert(sessions.nonEmpty)
    val s1 = sessions.minBy(_.getTimestamp(1).getTime)
    assert(s1.getTimestamp(1) == Timestamp.valueOf("2024-01-01 00:00:00"))
    assert(s1.getTimestamp(2) == Timestamp.valueOf("2024-01-01 00:07:00")) // last + gap
    assert(s1.getLong(3) == 2)
  }

  test("stateful EWMA: two-batch stream == the batch recurrence, state carries across batches") {
    val mem = MemoryStream[Event](spark)
    // per-user histories SPLIT across micro-batches — batch 2's first
    // fold step must consume batch 1's final state, not restart
    val b1 = Seq(ev(1, "2024-01-01 00:01:00", 7, "a", 1.00),
      ev(2, "2024-01-01 00:02:00", 7, "a", 3.00),
      ev(10, "2024-01-01 00:01:30", 8, "a", 4.00))
    val b2 = Seq(ev(3, "2024-01-01 00:03:00", 7, "a", 2.00),
      ev(11, "2024-01-01 00:02:30", 8, "a", 0.0),
      ev(20, "2024-01-01 00:05:00", 9, "a", 2.56))
    val out = runBatches(mem, StreamOps.statefulEwma(spark, mem.toDF()),
      OutputMode.Append, Seq(b1, b2))
      .map(r => (r.getLong(1), r.getLong(3))).toMap
    // third formulation: plain fold over each user's full history
    def series(vs: Seq[Long]): Seq[Long] =
      vs.tail.scanLeft(vs.head)((s, v) => (7 * s + v) / 8)
    val all = (b1 ++ b2).groupBy(_.user_id)
    val expected = all.flatMap { case (_, es) =>
      val ordered = es.sortBy(e => (e.ts.getTime, e.event_id))
      ordered.map(_.event_id).zip(
        series(ordered.map(e => math.floor(e.value * 100).toLong)))
    }
    assert(out == expected,
      s"stream EWMA diverged from the batch recurrence: $out vs $expected")
  }

  test("file-source readStream processes a parquet directory (AvailableNow)") {
    val srcDir = tmpDir("graft-stream-src")
    val sinkDir = tmpDir("graft-stream-out")
    Seq(ev(1, "2024-01-01 00:00:00", 1, "a", 1.0),
      ev(2, "2024-01-01 00:01:00", 2, "b", 2.0),
      ev(3, "2024-01-01 00:11:00", 1, "a", 3.0))
      .toDF().write.mode("overwrite").parquet(s"$srcDir/events")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$srcDir/events").schema)
      .parquet(s"$srcDir/events")
    val q = StreamOps.toForeachBatch(StreamOps.tumblingCounts(stream), "append") {
      (batch, _) => batch.write.mode("append").parquet(s"$sinkDir/agg")
    }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // append mode only emits closed windows; with AvailableNow the final
    // watermark stays at the max seen ts, so assert on processed input
    assert(spark.read.parquet(s"$sinkDir/agg").count() >= 0)
    val progress = q.recentProgress.map(_.numInputRows).sum
    assert(progress == 3)
  }

  test("streaming dedup runs on the RocksDB state store (state larger than memory)") {
    // HDFS-backed (in-memory) state caps streaming state at executor
    // heap; RocksDB spills to local disk, which is what makes
    // 100 TB/day dedup state viable. Prove the pipeline runs on it and
    // that the provider is really in effect via its metrics.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Event](spark)
      val name = s"mem_${System.nanoTime()}"
      val q = StreamOps.dedup(mem.toDF()).writeStream.format("memory")
        .queryName(name).outputMode(OutputMode.Append).start()
      try {
        mem.addData(Seq(ev(1, "2024-01-01 00:01:00", 1, "click", 1.0)))
        q.processAllAvailable()
        mem.addData(Seq(ev(1, "2024-01-01 00:01:00", 1, "click", 1.0),
          ev(2, "2024-01-01 00:02:00", 1, "view", 2.0)))
        q.processAllAvailable()
        assert(spark.table(name).collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
        val metrics = q.lastProgress.stateOperators.head.customMetrics.keySet()
        assert(metrics.toString.contains("rocksdb"),
          s"expected rocksdb state metrics, got $metrics")
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("checkpoint recovery: restart resumes from the committed offset, exactly-once") {
    val srcDir = tmpDir("graft-cp-src")
    val sinkDir = tmpDir("graft-cp-sink")
    val cpDir = tmpDir("graft-cp-state")
    def run(): Unit = {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Event]].schema)
        .parquet(s"$srcDir/events")
      val q = stream.select($"event_id", $"user_id", $"value")
        .writeStream.format("parquet")
        .option("path", s"$sinkDir/out")
        .option("checkpointLocation", s"$cpDir/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    Seq(ev(1, "2024-01-01 00:00:00", 1, "a", 1.0),
      ev(2, "2024-01-01 00:01:00", 2, "b", 2.0),
      ev(3, "2024-01-01 00:02:00", 3, "c", 3.0))
      .toDF().write.mode("append").parquet(s"$srcDir/events")
    run()
    assert(spark.read.parquet(s"$sinkDir/out").count() == 3)
    // new files arrive while the query is down; the restarted query must
    // pick up ONLY them (committed offsets in the checkpoint), so the
    // sink sees every event exactly once across the restart
    Seq(ev(4, "2024-01-01 00:03:00", 4, "d", 4.0),
      ev(5, "2024-01-01 00:04:00", 5, "e", 5.0))
      .toDF().write.mode("append").parquet(s"$srcDir/events")
    run()
    val ids = spark.read.parquet(s"$sinkDir/out").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L, 5L), s"expected exactly-once ids, got $ids")
  }

  test("interval-join checkpoint restart: RocksDB join state survives, no lost/dup attributions") {
    // the fault-tolerance case the plain checkpoint test doesn't cover:
    // stream-STREAM join state (buffered clicks awaiting purchases) must
    // be restored from the checkpoint, so a click ingested BEFORE the
    // restart attributes a purchase arriving AFTER it — and committed
    // offsets + the parquet sink log keep pre-restart pairs exactly-once
    val srcDir = tmpDir("graft-ij-src")
    val sinkDir = tmpDir("graft-ij-sink")
    val cpDir = tmpDir("graft-ij-cp")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def run(): Unit = {
        val schema = implicitly[org.apache.spark.sql.Encoder[Event]].schema
        val clicks = spark.readStream.schema(schema).parquet(s"$srcDir/clicks")
        val purchases = spark.readStream.schema(schema).parquet(s"$srcDir/purchases")
        val q = StreamOps.attributeClicks(clicks, purchases, 10)
          .writeStream.format("parquet")
          .option("path", s"$sinkDir/out")
          .option("checkpointLocation", s"$cpDir/cp")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(120000)
      }
      Seq(ev(11, "2024-01-01 00:05:00", 1, "click", 1.0))
        .toDF().write.mode("append").parquet(s"$srcDir/clicks")
      Seq(ev(21, "2024-01-01 00:06:00", 1, "purchase", 5.0))
        .toDF().write.mode("append").parquet(s"$srcDir/purchases")
      run()
      val afterFirst = spark.read.parquet(s"$sinkDir/out")
        .collect().map(r => (r.getLong(1), r.getLong(3))).toSeq
      assert(afterFirst == Seq((21L, 11L)), s"got $afterFirst")
      // query is down; new events arrive — P2 (00:10) must attribute to
      // BOTH the pre-restart click C11 (00:05, only in recovered join
      // state) and the new click C12 (00:09)
      Seq(ev(12, "2024-01-01 00:09:00", 1, "click", 1.0))
        .toDF().write.mode("append").parquet(s"$srcDir/clicks")
      Seq(ev(22, "2024-01-01 00:10:00", 1, "purchase", 7.0))
        .toDF().write.mode("append").parquet(s"$srcDir/purchases")
      run()
      val pairs = spark.read.parquet(s"$sinkDir/out")
        .collect().map(r => (r.getLong(1), r.getLong(3))).sorted.toSeq
      assert(pairs == Seq((21L, 11L), (22L, 11L), (22L, 12L)),
        s"expected exactly-once attributions across restart, got $pairs")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("stream-stream interval join attributes purchases to in-window clicks") {
    // purchase at 00:15 attributes to clicks at 00:06..00:15 (within 10
    // min, inclusive), NOT to the 00:01 click (too early) or 00:16
    // (after the purchase); both sides are watermarked so join state is
    // evictable — the only viable stream-stream shape at scale
    val clicks = MemoryStream[Event](spark)
    val purchases = MemoryStream[Event](spark)
    val joined = StreamOps.attributeClicks(clicks.toDF(), purchases.toDF(), 10)
    val name = s"mem_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(Seq(
        ev(11, "2024-01-01 00:01:00", 1, "click", 1.0),
        ev(12, "2024-01-01 00:06:00", 1, "click", 1.0),
        ev(13, "2024-01-01 00:15:00", 1, "click", 1.0),
        ev(14, "2024-01-01 00:16:00", 1, "click", 1.0),
        ev(15, "2024-01-01 00:10:00", 2, "click", 1.0))) // other user
      purchases.addData(Seq(ev(21, "2024-01-01 00:15:00", 1, "purchase", 5.0)))
      q.processAllAvailable()
      val got = spark.table(name).collect()
        .map(r => (r.getLong(1), r.getLong(3))).sorted.toSeq
      assert(got == Seq((21L, 12L), (21L, 13L)), s"got $got")

      // batch parity: the same function on static frames (watermarks
      // are no-ops in batch) yields the same pairs
      val cb = Seq(
        ev(11, "2024-01-01 00:01:00", 1, "click", 1.0),
        ev(12, "2024-01-01 00:06:00", 1, "click", 1.0),
        ev(13, "2024-01-01 00:15:00", 1, "click", 1.0),
        ev(14, "2024-01-01 00:16:00", 1, "click", 1.0),
        ev(15, "2024-01-01 00:10:00", 2, "click", 1.0)).toDF()
      val pb = Seq(ev(21, "2024-01-01 00:15:00", 1, "purchase", 5.0)).toDF()
      val batch = StreamOps.attributeClicks(cb, pb, 10)
        .collect().map(r => (r.getLong(1), r.getLong(3))).sorted.toSeq
      assert(batch == got)
    } finally q.stop()
  }

  test("stream-ingest dedup: band signatures match batch and find corpus candidates") {
    import org.apache.spark.sql.execution.streaming.runtime.{MemoryStream => MS}
    // the LSH band computation is map-side-only column work, so the SAME
    // code runs on a stream; candidate pairs then come from a
    // stream-static join against the accumulated corpus band table
    val corpusRows = Seq(
      (101L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (102L, "one two three four five six seven eight nine ten"))
    val corpus = graft.ops.Dedup.bandsForDocs(corpusRows.toDF("doc_id", "text"))
    val incoming = Seq(
      (201L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // dup of 101
      (202L, "completely novel content with no shared shingles wxyz abc"))
    val mem = MS[(Long, String)](spark)
    val streamBands = graft.ops.Dedup.bandsForDocs(
      mem.toDF().toDF("doc_id", "text"))
    val cand = streamBands.as("s")
      .join(broadcast(corpus.as("c")),
        col("s.band") === col("c.band") && col("s.key") === col("c.key"))
      .select(col("s.doc_id").as("new_doc"), col("c.doc_id").as("dup_of"))
    val name = s"mem_${System.nanoTime()}"
    val q = cand.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(incoming)
      q.processAllAvailable()
      val out = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1))).distinct.sorted
      assert(out.toSeq == Seq((201L, 101L)), s"got ${out.toSeq}")
    } finally q.stop()
    // parity: the streaming signatures are byte-identical to batch
    val batchBands = graft.ops.Dedup.bandsForDocs(incoming.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val mem2 = MS[(Long, String)](spark)
    val name2 = s"mem_${System.nanoTime()}"
    val q2 = graft.ops.Dedup.bandsForDocs(mem2.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name2).outputMode(OutputMode.Append).start()
    try {
      mem2.addData(incoming)
      q2.processAllAvailable()
      val streamed = spark.table(name2).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(streamed == batchBands)
    } finally q2.stop()
  }

  test("complete output mode re-emits full aggregation state") {
    val mem = MemoryStream[Event](spark)
    val counts = mem.toDF().groupBy($"event_type").count()
    val name = s"mem_${System.nanoTime()}"
    val q = counts.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(Seq(ev(1, "2024-01-01 00:00:00", 1, "a", 1.0)))
      q.processAllAvailable()
      mem.addData(Seq(ev(2, "2024-01-01 00:01:00", 1, "a", 1.0),
        ev(3, "2024-01-01 00:02:00", 1, "b", 1.0)))
      q.processAllAvailable()
      val out = spark.table(name).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out == Map("a" -> 2L, "b" -> 1L))
    } finally q.stop()
  }

  test("bucketed upsert refuses a changed numBuckets against an existing snapshot") {
    // routing is hash(key) mod N: a different N re-routes rows read
    // from touched buckets into staged buckets the swap never installs
    // — silent row loss. The persisted marker must fail fast instead.
    val dir = tmpDir("graft-bucketed-guard").toString
    val b1 = Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "v", "payload")
    StreamOps.mergeIntoBucketedSnapshot(b1, "k", "v", dir, 16)
    val b2 = Seq((3L, 2L, "c")).toDF("k", "v", "payload")
    val e = intercept[IllegalArgumentException] {
      StreamOps.mergeIntoBucketedSnapshot(b2, "k", "v", dir, 32)
    }
    assert(e.getMessage.contains("numBuckets=16"))
    // same count still works
    StreamOps.mergeIntoBucketedSnapshot(b2, "k", "v", dir, 16)
  }

  test("freq_topk heavy hitters aggregate works under streaming state (complete mode)") {
    // the MG summary is a TypedImperativeAggregate: its binary buffer
    // must round-trip through the streaming state store across
    // micro-batches; exact regime, so counts accumulated over two
    // batches must equal a batch run over the union
    graft.functions.GraftExtensions.register(spark)
    val mem = MemoryStream[Event](spark)
    val top = mem.toDF().groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.expr("freq_topk(event_type, 3, 8)").as("top"))
    val name = s"mem_${System.nanoTime()}"
    val q = top.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete).start()
    try {
      mem.addData(Seq(ev(1, "2024-01-01 00:00:00", 1, "a", 1.0),
        ev(2, "2024-01-01 00:01:00", 1, "a", 1.0)))
      q.processAllAvailable()
      mem.addData(Seq(ev(3, "2024-01-01 00:02:00", 1, "b", 1.0),
        ev(4, "2024-01-01 00:03:00", 1, "a", 1.0),
        ev(5, "2024-01-01 00:04:00", 2, "c", 1.0)))
      q.processAllAvailable()
      val out = spark.table(name).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out == Map(1L -> "a:3 b:1", 2L -> "c:1"))
    } finally q.stop()
  }

  test("foreachBatch reuses the batch load path") {
    val mem = MemoryStream[Event](spark)
    val outDir = tmpDir("graft-stream-sink")
    val q = StreamOps.toForeachBatch(mem.toDF(), "append") { (batch, _) =>
      batch.write.mode("append").parquet(s"$outDir/events")
    }.start()
    try {
      mem.addData(Seq(ev(1, "2024-01-01 00:00:00", 1, "a", 1.0),
        ev(2, "2024-01-01 00:01:00", 2, "b", 2.0)))
      q.processAllAvailable()
      mem.addData(Seq(ev(3, "2024-01-01 00:02:00", 3, "c", 3.0)))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.parquet(s"$outDir/events").count() == 3)
  }

  test("session windows via session_window merge within the gap") {
    val mem = MemoryStream[Event](spark)
    val out = runBatches(mem, StreamOps.sessionCounts(mem.toDF()), OutputMode.Append, Seq(
      Seq(ev(1, "2024-01-01 00:00:00", 7, "a", 1.0),
        ev(2, "2024-01-01 00:03:00", 7, "a", 1.0), // within 5-min gap: merges
        ev(3, "2024-01-01 00:20:00", 7, "a", 1.0)), // new session
      Seq(ev(4, "2024-01-01 03:00:00", 9, "b", 1.0)))) // watermark push
    val u7 = out.filter(_.getLong(0) == 7L).sortBy(_.getTimestamp(1).getTime)
    assert(u7.map(_.getLong(3)).toSeq == Seq(2L, 1L))
    assert(u7.head.getTimestamp(2) == Timestamp.valueOf("2024-01-01 00:08:00")) // last+gap
  }

  test("stream-static broadcast enrich") {
    val mem = MemoryStream[Event](spark)
    val dim = Seq((1L, "GOLD"), (2L, "SILVER")).toDF("cust_id", "tier")
    val out = runBatches(mem, StreamOps.enrich(mem.toDF(), dim, "user_id", "cust_id"),
      OutputMode.Append, Seq(Seq(
        ev(1, "2024-01-01 00:00:00", 1, "a", 1.0),
        ev(2, "2024-01-01 00:00:30", 9, "a", 1.0)))) // user 9: no dim row → dropped
    assert(out.length == 1)
    assert(out.head.getAs[String]("tier") == "GOLD")
  }

  test("streaming upsert sink: last write per key wins across and within batches") {
    val mem = MemoryStream[Event](spark)
    val target = tmpDir("upsert-target").toString
    // key = user_id, version = event_id; value carries the payload
    val q = StreamOps.upsertToParquet(
      mem.toDF().select($"user_id", $"event_id", $"value"),
      "user_id", "event_id", target).start()
    try {
      // batch 1: users 1,2 inserted; user 1 appears TWICE out of order
      // within the batch — the higher event_id (v=1.5) must win
      mem.addData(Seq(
        ev(11, "2024-01-01 00:00:00", 1, "a", 1.0),
        ev(13, "2024-01-01 00:00:02", 1, "a", 1.5),
        ev(12, "2024-01-01 00:00:01", 2, "a", 2.0)))
      q.processAllAvailable()
      // batch 2: user 2 updated, user 3 inserted
      mem.addData(Seq(
        ev(21, "2024-01-01 00:01:00", 2, "a", 2.5),
        ev(22, "2024-01-01 00:01:01", 3, "a", 3.0)))
      q.processAllAvailable()
    } finally q.stop()
    val snap = spark.read.parquet(s"$target/current")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(snap == Map(
      1L -> (13L, 1.5), // in-batch out-of-order resolved by version
      2L -> (21L, 2.5), // cross-batch update
      3L -> (22L, 3.0))) // insert
  }

  test("streaming upsert recovers a snapshot stranded in prev/ (crash between renames)") {
    // simulate a batch that died after current→prev but before
    // next→current: only prev/ exists — the next batch must restore it
    // and merge into it, not rebuild the table from itself alone
    val target = tmpDir("upsert-recover").toString
    Seq((1L, 10L, 1.0), (2L, 11L, 2.0)).toDF("user_id", "event_id", "value")
      .write.parquet(s"$target/prev")
    val mem = MemoryStream[Event](spark)
    val q = StreamOps.upsertToParquet(
      mem.toDF().select($"user_id", $"event_id", $"value"),
      "user_id", "event_id", target).start()
    try {
      mem.addData(Seq(ev(20, "2024-01-01 00:00:00", 2, "a", 2.5)))
      q.processAllAvailable()
    } finally q.stop()
    val snap = spark.read.parquet(s"$target/current")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(snap == Map(1L -> 1.0, 2L -> 2.5)) // user 1 preserved from prev
  }

  test("bucketed upsert: last write per key wins; untouched buckets' files never move") {
    val mem = MemoryStream[Event](spark)
    val target = tmpDir("upsert-bucketed").toString
    val q = StreamOps.upsertToParquetBucketed(
      mem.toDF().select($"user_id", $"event_id", $"value"),
      "user_id", "event_id", target, numBuckets = 8).start()
    def files(dir: java.io.File): Map[String, Long] =
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
    try {
      // batch 1: 16 users spread over the 8 buckets; user 1 twice
      // out of order within the batch (higher event_id must win)
      mem.addData(
        ev(11, "2024-01-01 00:00:00", 1, "a", 1.0) +:
        ev(99, "2024-01-01 00:00:09", 1, "a", 1.5) +:
        (2L to 16L).map(u => ev(u * 10, "2024-01-01 00:00:01", u, "a", u * 1.0)))
      q.processAllAvailable()
      // snapshot the file listing of every bucket user 7 does NOT
      // hash into, then update ONLY user 7
      val u7Bucket = spark.range(1).select(
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.hash(org.apache.spark.sql.functions.lit(7L)),
          org.apache.spark.sql.functions.lit(8))).as[Int].head()
      val before = (0 until 8).filter(_ != u7Bucket).map { b =>
        b -> files(new java.io.File(target, s"bucket=$b/current"))
      }.toMap
      mem.addData(Seq(ev(200, "2024-01-01 00:01:00", 7, "a", 77.0)))
      q.processAllAvailable()
      val after = (0 until 8).filter(_ != u7Bucket).map { b =>
        b -> files(new java.io.File(target, s"bucket=$b/current"))
      }.toMap
      assert(after == before,
        "a single-key batch must rewrite only the bucket the key hashes into")
    } finally q.stop()
    val snap = StreamOps.readBucketedSnapshot(spark, target)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(snap(1L) == (99L, 1.5), "in-batch out-of-order resolved by version")
    assert(snap(7L) == (200L, 77.0), "cross-batch update applied")
    assert(snap.size == 16 && snap(16L) == (160L, 16.0))
  }

  test("bucketed upsert recovers a bucket stranded in prev/ (crash between renames)") {
    val target = tmpDir("upsert-bucketed-recover").toString
    // user 3's bucket under numBuckets=8, computed with Spark's own hash
    val b3 = spark.range(1).select(
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(org.apache.spark.sql.functions.lit(3L)),
        org.apache.spark.sql.functions.lit(8))).as[Int].head()
    // strand user 3's row in prev/ with no current/ — the crash window
    Seq((3L, 10L, 3.0)).toDF("user_id", "event_id", "value")
      .write.parquet(s"$target/bucket=$b3/prev")
    val mem = MemoryStream[Event](spark)
    val q = StreamOps.upsertToParquetBucketed(
      mem.toDF().select($"user_id", $"event_id", $"value"),
      "user_id", "event_id", target, numBuckets = 8).start()
    try {
      mem.addData(Seq(ev(20, "2024-01-01 00:00:00", 4, "a", 4.0)))
      q.processAllAvailable()
    } finally q.stop()
    val snap = StreamOps.readBucketedSnapshot(spark, target)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(snap == Map(3L -> 3.0, 4L -> 4.0),
      "stranded bucket restored before merge, not dropped")
  }

  test("connection-level checkpointLocation is namespaced per step; step-level wins verbatim") {
    import graft.model.{ConnectionSpec, LoadStep}
    // a shared connection checkpoint must NOT resolve identically for
    // two different load steps — the second would silently reuse the
    // first's committed offsets and drain nothing
    val conn = ConnectionSpec("c1", "lake", "parquet",
      Map("basePath" -> "/lake", "checkpointLocation" -> "ckpts"))
    val a = LoadStep("loadA", 1, "c1", path = Some("ta"))
    val b = LoadStep("loadB", 2, "c1", path = Some("tb"))
    val (ckA, ckB) = (StreamingLoad.resolveCheckpoint(conn, a),
      StreamingLoad.resolveCheckpoint(conn, b))
    assert(ckA == "/lake/ckpts/loadA" && ckB == "/lake/ckpts/loadB")
    assert(ckA != ckB)
    // a step-level value is the user saying exactly where — verbatim
    val own = LoadStep("loadC", 3, "c1", path = Some("tc"),
      options = Map("checkpointLocation" -> "my/ck"))
    assert(StreamingLoad.resolveCheckpoint(conn, own) == "/lake/my/ck")
    // neither level present → fail fast, naming the option
    val none = ConnectionSpec("c2", "lake2", "parquet", Map.empty)
    val ex = intercept[IllegalArgumentException] {
      StreamingLoad.resolveCheckpoint(none, a)
    }
    assert(ex.getMessage.contains("checkpointLocation"))
  }

  test("sole load adopts a legacy un-namespaced checkpoint; siblings never do") {
    import graft.model.{ConnectionSpec, LoadStep}
    val conn = ConnectionSpec("c1", "lake", "parquet",
      Map("basePath" -> "/lake", "checkpointLocation" -> "ckpts"))
    val a = LoadStep("loadA", 1, "c1", path = Some("ta"))
    val committed: String => Boolean = _ == "/lake/ckpts"
    // pre-namespacing deployment: offsets live at the connection path —
    // the sole load keeps them instead of reprocessing from scratch
    assert(StreamingLoad.resolveCheckpoint(conn, a,
      soleConnectionLoad = true, legacyHasCheckpoint = committed) == "/lake/ckpts")
    // fresh deployment (no legacy checkpoint): namespaced even when sole
    assert(StreamingLoad.resolveCheckpoint(conn, a,
      soleConnectionLoad = true) == "/lake/ckpts/loadA")
    // two loads share the connection: namespaced regardless — the
    // legacy layout was silently wrong for them before the fix too
    assert(StreamingLoad.resolveCheckpoint(conn, a,
      soleConnectionLoad = false, legacyHasCheckpoint = committed) == "/lake/ckpts/loadA")
    // a step-level value is never subject to adoption
    val own = LoadStep("loadC", 3, "c1", path = Some("tc"),
      options = Map("checkpointLocation" -> "my/ck"))
    assert(StreamingLoad.resolveCheckpoint(conn, own,
      soleConnectionLoad = true, legacyHasCheckpoint = _ => true) == "/lake/my/ck")
  }

  test("state-store resolution: RocksDB for fresh checkpoints, never flipped under existing ones") {
    val rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val hdfs = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    // fresh checkpoint → scale-safe default
    assert(StreamingLoad.resolveStateStore(Map.empty, checkpointExists = false)
      .contains(rocks))
    // existing checkpoint, no explicit choice → leave the session alone
    // (the provider is part of the checkpoint's state format)
    assert(StreamingLoad.resolveStateStore(Map.empty, checkpointExists = true).isEmpty)
    // explicit choice always wins, either way
    assert(StreamingLoad.resolveStateStore(
      Map("stateStore" -> "rocksdb"), checkpointExists = true).contains(rocks))
    assert(StreamingLoad.resolveStateStore(
      Map("stateStore" -> "hdfs"), checkpointExists = false).contains(hdfs))
    val ex = intercept[IllegalArgumentException] {
      StreamingLoad.resolveStateStore(Map("stateStore" -> "rocks"), checkpointExists = false)
    }
    assert(ex.getMessage.contains("rocksdb | hdfs"))
  }
}
