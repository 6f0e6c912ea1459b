package graft.exec

import graft.SparkSpec
import graft.ops.{Dedup, Sharding, TextAnalysis}
import org.apache.spark.sql.functions._

/** PLANS.md's shuffle claims, ASSERTED with listener-measured numbers
  * (`SparkMetrics`) instead of prose: zero-shuffle model serving,
  * one-exchange shard writes, and the bloom path's record-volume win
  * over the exact join. These are the invariants that decide 100 TB
  * behavior; a regression that adds an exchange goes red here.
  */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("frozen-model scoring shuffles ZERO records (stateless map-side serving)") {
    val docs = graft.Tables.t(spark, dir, "documents")
    val model = TextAnalysis.trainQualityModel(spark, docs,
      Seq("src0", "src1", "src2", "src3"))
    graft.CacheScope.drain()
    val (_, m) = SparkMetrics.measure(spark) {
      TextAnalysis.scoreDocs(docs, model)
        .write.format("noop").mode("overwrite").save()
    }
    assert(m.shuffleWriteRecords == 0L,
      s"scoring shuffled ${m.shuffleWriteRecords} records — must be map-side only")
    assert(m.inputRecords >= 500L) // it did actually read the corpus
  }

  test("frozen-PCA projection shuffles ZERO records (stateless map-side serving)") {
    // same contract as the quality model: the literal-array fold must
    // never grow an exchange (an explode+join rewrite would)
    val emb = graft.Tables.t(spark, dir, "embeddings")
    val model = graft.ops.Similarity.trainPcaModel(spark, emb, k = 2)
    graft.CacheScope.drain()
    val (_, m) = SparkMetrics.measure(spark) {
      graft.ops.Similarity.pcaServeOn(emb, model)
        .write.format("noop").mode("overwrite").save()
    }
    assert(m.shuffleWriteRecords == 0L,
      s"projection shuffled ${m.shuffleWriteRecords} records — must be map-side only")
    assert(m.inputRecords >= 500L)
  }

  test("prefix-index build shuffles ZERO records (pure per-row encoding)") {
    // the append ≡ rebuild property rests on encoding being a pure
    // map — an exchange appearing here would break it silently
    val emb = graft.Tables.t(spark, dir, "embeddings")
    graft.CacheScope.drain()
    val (_, m) = SparkMetrics.measure(spark) {
      graft.ops.Similarity.buildPrefixIndex(spark, emb)
        .write.format("noop").mode("overwrite").save()
    }
    graft.CacheScope.drain()
    assert(m.shuffleWriteRecords == 0L,
      s"index build shuffled ${m.shuffleWriteRecords} records — must be map-side only")
    assert(m.inputRecords >= 500L)
  }

  test("shard writer moves each row once (one exchange), manifest adds only bounded rows") {
    val docs = graft.Tables.t(spark, dir, "documents")
    val n = docs.count()
    val out = tmpDir("metrics-shards").toString + "/shards"
    graft.CacheScope.drain()
    val (_, m) = SparkMetrics.measure(spark) {
      Sharding.writeTrainingShards(docs, "doc_id", out, 16)
    }
    // the data exchange shuffles each row exactly once; the manifest's
    // per-shard counts add at most a few hundred partial-agg rows
    assert(m.shuffleWriteRecords >= n,
      s"expected >= $n shuffled rows, got ${m.shuffleWriteRecords}")
    assert(m.shuffleWriteRecords <= n + 2048L,
      s"${m.shuffleWriteRecords} shuffled rows for $n docs — an extra full exchange appeared")
  }

  test("curriculum-ordered shard write: same one data exchange, extra rows grid-bounded") {
    // the annealing order must stay a SORT KEY, not a second job: the
    // corpus crosses one exchange exactly as in the plain write, and
    // the quantile threshold adds only histogram partials (≤ grid ×
    // partitions) — a data-sized second shuffle here means the
    // composition regressed to a sort or a join
    val docs = graft.Tables.t(spark, dir, "documents")
      .withColumn("q", expr(TextAnalysis.ttrPermilleSql("text")))
    val n = docs.count()
    val out = tmpDir("metrics-curriculum").toString + "/shards"
    graft.CacheScope.drain()
    val (_, m) = SparkMetrics.measure(spark) {
      val ordered = Sharding.withCurriculumOrder(docs, "doc_id", "q", 100L)
      Sharding.writeTrainingShards(ordered, "doc_id", out, 16,
        orderCol = Some("curriculum_key"))
    }
    assert(m.shuffleWriteRecords >= n,
      s"expected >= $n shuffled rows, got ${m.shuffleWriteRecords}")
    assert(m.shuffleWriteRecords <= n + 16384L,
      s"${m.shuffleWriteRecords} shuffled rows for $n docs — the curriculum " +
        "composition added a data-sized exchange")
  }

  test("trend's shuffle is day-grid-bounded; EWMA's is one corpus-sized pass") {
    // the trend fit must never shuffle event volume twice: the
    // (type, day) rollup's partials are ≤ |types×days| per map
    // partition, and the second rollup moves the collapsed daily
    // table only. EWMA's total is ~n records: the grouped collect's
    // partials combine map-side (per-user arrays), so the n-row
    // volume is the gate ORDER BY of the output — one corpus-sized
    // exchange overall, never two.
    val events = graft.Tables.t(spark, dir, "events")
    val n = events.count()
    graft.CacheScope.drain()
    val (_, mt) = SparkMetrics.measure(spark) {
      graft.ops.EventOps.trend(spark, dir).collect()
    }
    assert(mt.shuffleWriteRecords < n / 2,
      s"trend shuffled ${mt.shuffleWriteRecords} records for $n events — " +
        "the daily rollup stopped combining map-side")
    graft.CacheScope.drain()
    val (_, me) = SparkMetrics.measure(spark) {
      graft.ops.EventOps.ewma(spark, dir).collect()
    }
    assert(me.shuffleWriteRecords >= n && me.shuffleWriteRecords <= n + 4096L,
      s"EWMA shuffled ${me.shuffleWriteRecords} records for $n events — " +
        "expected exactly one pass of the corpus")
  }

  test("bloom decontamination shuffles a fraction of the exact join's records (at-scale plan)") {
    // at gate scale AQE broadcasts the bench side of the exact join and
    // its shuffle vanishes — the honest comparison is the AT-SCALE plan
    // where neither shingle stream is broadcastable, so broadcast is
    // disabled for BOTH measured blocks (the bloom path has no join to
    // broadcast anyway: its probe is a literal)
    val docs = graft.Tables.t(spark, dir, "documents")
    val bench = docs.filter($"doc_id" % 100 === 0)
    val corpus = docs.filter($"doc_id" % 100 =!= 0)
    val bloom = Dedup.benchmarkBloom(bench)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.CacheScope.drain()
      val (_, mBloom) = SparkMetrics.measure(spark) {
        Dedup.bloomClean(corpus, bloom).count()
      }
      graft.CacheScope.drain()
      val sh = (df: org.apache.spark.sql.DataFrame) =>
        df.select($"doc_id", $"lang", split($"text", " ").as("__ws"))
          .select($"doc_id", $"lang", explode(Dedup.shinglesFromWords($"__ws")).as("wd"))
      val (_, mExact) = SparkMetrics.measure(spark) {
        corpus.join(
          sh(corpus).as("c").join(sh(bench).as("b"),
              col("c.wd") === col("b.wd") && col("c.lang") === col("b.lang"), "left_semi")
            .select(col("doc_id")).distinct(),
          Seq("doc_id"), "left_anti").count()
      }
      assert(mBloom.shuffleWriteRecords * 2 < mExact.shuffleWriteRecords,
        s"bloom=${mBloom.shuffleWriteRecords} exact=${mExact.shuffleWriteRecords} — " +
          "the bloom path must shuffle at most half the exact join's records")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("binned token budget's shuffle is BOUNDED; the exact greedy's is linear in docs") {
    // the deployment claim, measured: the exact path pushes every doc
    // row through its per-source window shuffle (>= n_docs records);
    // the binned path's rollup is bounded by sources × 1001 permille
    // bins NO MATTER the corpus size (the flat-at-10×/30× ScaleUp rows
    // are this bound in action). At gate scale the bound exceeds the
    // tiny corpus — asserting binned < exact here would assert the
    // wrong property.
    val nDocs = graft.Tables.t(spark, dir, "documents").count()
    val nSources = 20L
    graft.CacheScope.drain()
    val (_, mExact) = SparkMetrics.measure(spark) {
      TextAnalysis.tokenBudgetSelect(spark, dir).collect()
    }
    graft.CacheScope.drain()
    val (_, mBinned) = SparkMetrics.measure(spark) {
      TextAnalysis.tokenBudgetSelectBinned(spark, dir).collect()
    }
    assert(mExact.shuffleWriteRecords >= nDocs,
      s"exact=${mExact.shuffleWriteRecords} — every doc row crosses the window shuffle")
    assert(mBinned.shuffleWriteRecords <= nSources * 1001L * 2L,
      s"binned=${mBinned.shuffleWriteRecords} — must stay within the bin bound")
  }

  test("split-shard writer costs the same one exchange as the flat writer") {
    // the split is a within-task sort level + writer partition column;
    // a second repartition (e.g. on (split, shard)) would double the
    // shuffled rows and go red here
    val docs = graft.Tables.t(spark, dir, "documents")
      .withColumn("split", when($"doc_id" % 10 === 0, "val").otherwise("train"))
    val n = docs.count()
    val out = tmpDir("metrics-split-shards").toString + "/t"
    graft.CacheScope.drain()
    val (_, m) = SparkMetrics.measure(spark) {
      Sharding.writeSplitShards(docs, "split", "doc_id", out, 16)
    }
    assert(m.shuffleWriteRecords >= n,
      s"expected >= $n shuffled rows, got ${m.shuffleWriteRecords}")
    assert(m.shuffleWriteRecords <= n + 2048L,
      s"${m.shuffleWriteRecords} shuffled rows for $n docs — an extra exchange appeared")
  }

  test("epoch replication shuffles only the weights rollup, never corpus rows") {
    // the mix materialization must stay broadcast+map: the only
    // exchange is the |sources|-row weight rollup's partials. A join
    // that stopped broadcasting (or an explode pushed through an
    // exchange) would shuffle every corpus row and go red here.
    val docs = graft.Tables.t(spark, dir, "documents")
      .select($"doc_id", $"source",
        size(split($"text", " ")).cast("long").as("toks"))
    val nDocs = docs.count()
    val nSources = docs.select($"source").distinct().count()
    graft.CacheScope.drain()
    val (_, m) = SparkMetrics.measure(spark) {
      TextAnalysis.replicateByEpochs(docs,
        TextAnalysis.epochWeightsForTokenTarget(docs, 2000L))
        .write.format("noop").mode("overwrite").save()
    }
    assert(m.shuffleWriteRecords < nDocs,
      s"${m.shuffleWriteRecords} shuffled records for $nDocs docs — corpus rows crossed an exchange")
    assert(m.shuffleWriteRecords <= nSources * 64L,
      s"${m.shuffleWriteRecords} shuffled records — weight rollup should stay ~|sources| partials")
  }
}
