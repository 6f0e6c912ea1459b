package graft.ops

import graft.{Catalog, SparkSpec}
import org.apache.spark.sql.functions._

/** Skew behavior, asserted — the runtime half of the scale story that
  * ExplainAuditSpec's static plan pins can't see. Real event logs are
  * zipfian; the two defenses are AQE's runtime skew-split (for shuffle
  * joins) and the static salted join (SaltedJoin). This spec proves the
  * first actually ENGAGES (skew=true in the final adaptive plan, with
  * results unchanged) and pins the exchange budget of the
  * funnel/attribution pipelines, whose windowed shapes AQE cannot
  * split — their skew bound is the per-user work itself, measured on
  * the hot-key ScaleUp fixture (PLANS.md "skew stress").
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot partition of a skewed shuffle join (skew=true, results exact)") {
    // one hot key carrying 200k rows vs 50 cold keys — the shape the
    // hot-key ScaleUp fixture produces at 10×. Thresholds lowered to
    // fixture scale (the defaults are tuned for 256 MB partitions);
    // broadcast disabled so the join actually shuffles, as it would
    // when both sides are 100 TB-large.
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val hot = spark.range(200000).select(lit(1L).as("k"), $"id".as("v"))
      val cold = spark.range(50).select(($"id" + 2L).as("k"), $"id".as("v"))
      val right = spark.range(60).select(($"id" + 1L).as("k"), ($"id" * 2L).as("w"))
      val joined = hot.unionAll(cold).join(right, "k")
      val n = joined.count()
      assert(n == 200050L)
      val agg = joined.groupBy().agg(sum($"v")).as[Long].head()
      // exact sum: skew-split must not lose or duplicate hot-key rows
      assert(agg == 200000L * 199999L / 2 + (0L to 49L).sum)
      // the executed join must carry the skew=true marker — AQE detected
      // the hot partition and split it into advisory-sized chunks
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE skew-split did not engage:\n$plan")
    }
  }

  test("funnel plans exactly one hash exchange (stacked windows + agg share the user_id shuffle)") {
    val plan = Catalog.byName("q_evt_funnel").fn(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    spark.sharedState.cacheManager.clearCache()
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges == 1, s"funnel should shuffle events ONCE on user_id:\n$plan")
  }

  /** Exchange budgets of the round-5 event/feature rollups, pinned.
    * What matters at 100 TB is how many exchanges carry FULL-SCAN data
    * versus already-collapsed intermediates; the counts below encode
    * that split so a rewrite that adds a full-table shuffle goes red.
    */
  private def hashExchangeCount(name: String): Int = {
    val plan = Catalog.byName(name).fn(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    spark.sharedState.cacheManager.clearCache()
    "Exchange hashpartitioning".r.findAllIn(plan).length
  }

  test("zscore plans exactly one hash exchange (stats group-by; broadcast join adds none)") {
    assert(hashExchangeCount("q_feat_zscore") == 1)
  }

  test("minmax scale plans exactly one hash exchange (same stats-broadcast shape as zscore)") {
    assert(hashExchangeCount("q_feat_minmax") == 1)
  }

  test("repetition plans two hash exchanges: (doc,bigram) count then doc rollup") {
    assert(hashExchangeCount("q_text_repetition") == 2)
  }

  test("feature hash and embedding centroid each plan exactly one hash exchange") {
    assert(hashExchangeCount("q_feat_hash") == 1)
    assert(hashExchangeCount("q_emb_centroid") == 1)
  }

  test("hash split is pure map-side (zero hash exchanges)") {
    assert(hashExchangeCount("q_feat_split") == 0)
  }

  test("target encoding: full-data crosses one exchange; prior/enc work on the 5-row label table") {
    assert(hashExchangeCount("q_feat_target_enc") <= 2)
  }

  test("label index: one full-data hash exchange; the dictionary window is vocabulary-sized") {
    // the SinglePartition window here is over the POST-AGGREGATION
    // vocabulary (|labels| rows), not the data table — the one place a
    // global window is the right plan. Full-scan data crosses exactly
    // one hash exchange (the vocab group-by); the encode is a
    // broadcast join.
    assert(hashExchangeCount("q_feat_index") == 1)
  }

  test("retention plans four hash exchanges, only one over full-scan data") {
    // 1 full-data: the (user_id, wk) distinct with map-side partial
    // dedup — events collapse to users×weeks BEFORE the wire. The
    // other 3 (cohort group-by, act⋈cohort re-key, final
    // (cohort,offset) count-distinct) move only the collapsed
    // activity table.
    assert(hashExchangeCount("q_evt_retention") == 4)
  }

  test("wau plans three hash exchanges, only one over full-scan data") {
    // 1 full-data: the (user_id, day) distinct (map-side partial
    // dedup); the 7-day explode is a generator, not a shuffle; the
    // count-distinct rollup pair moves only day-deduped rows.
    assert(hashExchangeCount("q_evt_wau") == 3)
  }

  test("capped attribution adds no exchange over raw attribution (cap rides the click-side shuffle)") {
    // the last-N row_number window requires the same user_id hash
    // partitioning as the interval equi-join, so capping fan-out must
    // not cost a third exchange
    assert(hashExchangeCount("q_evt_attribution_capped") <= 2)
  }

  test("attribution plans one hash exchange per join side and no nested loop") {
    val plan = Catalog.byName("q_evt_attribution").fn(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    spark.sharedState.cacheManager.clearCache()
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges <= 2, s"attribution equi-join needs at most one exchange per side:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("source quota plans exactly one hash exchange (rank rides the source shuffle)") {
    assert(hashExchangeCount("q_text_source_quota") == 1)
  }

  test("group mode plans two hash exchanges: (group,value) counts then the group re-roll") {
    assert(hashExchangeCount("q_agg_mode") == 2)
  }

  test("hourly spikes: one full-data exchange; the trailing window rides the bounded hour table") {
    // the hour rollup is the only exchange over events; the ROWS-frame
    // window runs over the post-aggregation hour table (720 rows/month)
    // — the SkewSpec post-agg single-partition rule, same as label index
    assert(hashExchangeCount("q_evt_spikes") == 1)
  }

  test("rfm scoring plans exactly one hash exchange (one user-keyed rollup)") {
    // recency/frequency/monetary are three aggregates of the SAME
    // user_id group-by — a rewrite that scores them in separate passes
    // (3 shuffles of the full event log) goes red here
    assert(hashExchangeCount("q_evt_rfm") == 1)
  }

  test("incremental dedup plans one hash exchange per anti-join side") {
    // batch and snapshot each collapse to (md5 key) fingerprints
    // map-side; the LEFT ANTI then shuffles only the two narrow
    // fingerprint tables — corpus text never crosses the wire
    assert(hashExchangeCount("q_dedup_incremental") == 2)
  }

  test("keep-best adds zero hash exchanges over the cluster build it rides") {
    // the struct-min argmax rides the cluster-resolution shuffles and
    // the representative join back is broadcast — so keep_best's
    // exchange count must equal q_dedup_clusters' exactly (29 at this
    // fixture: the fixed 3-round label propagation + candidate build)
    assert(hashExchangeCount("q_dedup_keep_best") ==
      hashExchangeCount("q_dedup_clusters"))
  }

  test("sequence packing plans exactly one hash exchange (prefix-sum rides the lang shuffle)") {
    // the exclusive prefix-sum window, the chunk-id div, and the chunk
    // re-group all require the same per-language partitioning — one
    // shuffle of the token table serves the whole pack pipeline
    assert(hashExchangeCount("q_text_pack") == 1)
  }

  test("dup-ngram fraction: four exchanges, one over full gram volume (the lm_rarity family)") {
    // the (doc_id, gram) distinct is the only exchange seeing raw gram
    // volume (map-side partial dedup); the df re-roll, join back, and
    // per-doc rollup move the collapsed gram table
    assert(hashExchangeCount("q_text_dup_ngram") == 4)
  }

  test("language mixture: one full-data exchange; everything after is |languages| rows") {
    // lang token rollup is the single full-scan shuffle; the corpus
    // total / overflow sides are 1-row broadcasts (allowlisted scalar
    // cross joins), and the SinglePartition exchanges in this plan
    // carry exactly those 1-row aggregates
    assert(hashExchangeCount("q_text_mixture") == 4)
  }

  test("profile: one hash exchange (count-distinct expand), final single carries 20 scalars") {
    assert(hashExchangeCount("q_sql_profile") == 1)
  }

  test("expectations: same-table rules fuse — four lineitem rules, one lineitem scan") {
    val plan = Catalog.byName("q_sql_expectations").fn(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    spark.sharedState.cacheManager.clearCache()
    // lineitem appears once in the fused rule agg and once as the FK
    // child side — NOT once per rule (4 column rules share one scan)
    val lineitemScans = "Location.*lineitem".r.findAllIn(plan).length
    assert(lineitemScans == 2, s"expected 2 lineitem scans (fused agg + fk child):\n$plan")
  }

  test("span dedup: two hash exchanges — canonical agg and doc reassembly") {
    // the tumbling-span explode is map-side; the (span) canonical-min
    // agg and the (doc_id) reassembly rollup shuffle. At fixture scale
    // the canonical table broadcasts into the join-back (no third
    // exchange); at 100 TB that join becomes the third, g-keyed shuffle
    // — either way nothing re-moves full span volume twice on one key
    assert(hashExchangeCount("q_text_span_dedup") == 2)
  }

  test("grouped ntile: one exchange — the lang window partitioning serves the rollup too") {
    // hashpartitioning(lang) from the window satisfies the
    // (lang, quartile) rollup's clustered distribution — no re-shuffle
    assert(hashExchangeCount("q_feat_ntile_grouped") == 1)
  }

  test("heavy hitters: one exchange carrying ≤capacity counters per language") {
    // freq_topk partial-aggregates map-side; the wire sees MG summaries,
    // never the raw token stream. (The auto-sizing HLL pass is a
    // separate eager job at plan-construction time — the SERVED plan
    // audited here is still the single counter-summary exchange.)
    assert(hashExchangeCount("q_agg_heavy_hitters_auto") == 1)
  }

  test("kmv intersect: exchanges carry sketches on bounded keys, never row data") {
    // semantically two shuffles: the (lang) rollup to sketch states and
    // the (pair) merge rollup. The count reads 5 only because the
    // PERSISTED per-lang rollup's printed plan (containing its one
    // exchange) appears under both join sides and both union branches —
    // one physical exchange, four appearances, plus the merge rollup
    assert(hashExchangeCount("q_agg_kmv_intersect") == 5)
  }

  test("round-7 rows: exchange budgets pinned (full-scan data crosses each wire once)") {
    // (query, expected hash exchanges) — each row's shuffles are either
    // the one full-volume rollup/window its algorithm requires or
    // bounded aggregate tables; none re-moves raw data twice on one key
    val budgets = Seq(
      "q_win_interpolate" -> 1,       // one user-keyed window sort
      "q_evt_top_types" -> 1,         // window agg carries ≤16 counters
      "q_evt_paths" -> 2,             // user window + bounded path rollup
      "q_evt_cumulative_users" -> 2,  // user min-day + bounded day rollup
      "q_sql_intervals" -> 1,         // supplier window + rollups share it
      "q_feat_winsorize" -> 2,        // percentile rollup + clipped re-roll
      // median rollup + MAD rollup + final re-roll; reads 4 because the
      // deliberately-uncached dev subtree (containing the median
      // exchange) prints under both consumers — three physical shuffle
      // keys, and re-scanning parquet measured faster than caching
      "q_feat_mad" -> 4)
    budgets.foreach { case (name, expected) =>
      assert(hashExchangeCount(name) == expected,
        s"$name expected $expected hash exchanges")
    }
  }

  test("group split: assignment is map-side; both exchanges carry collapsed rows") {
    // COUNT(DISTINCT source) rewrites to two phases: a (split, source)
    // partial-dedup exchange (docs collapse to distinct sources
    // map-side before the wire) and the 3-row split re-roll
    assert(hashExchangeCount("q_feat_group_split") == 2)
  }
}
