package graft.ops

import graft.{CatalogEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.CacheScope.Scoped

/** Aggregation operators (SURVEY.md §2.B "Aggregation"). All run as
  * Catalyst HashAggregate with automatic partial (map-side) + final
  * phases — at 100 TB the shuffle carries only per-group partials.
  * Float measures go through the integer bridge (ops package doc);
  * min/max/count are order-independent and used raw.
  */
object Aggregates {

  /** Multi-key group-by with the full basic aggregate set. */
  def multiAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        min($"l_quantity").as("min_qty"),
        max($"l_quantity").as("max_qty"),
        min($"l_shipdate").as("first_ship"),
        max($"l_shipdate").as("last_ship"),
        davg($"l_extendedprice").as("avg_price"),
        countDistinct($"l_partkey").as("n_parts"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val multiAggSql =
    s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
       |  min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship,
       |  ${davgSql("l_extendedprice")} AS avg_price,
       |  COUNT(DISTINCT l_partkey) AS n_parts
       |FROM lineitem GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** COUNT(DISTINCT) + SUM(DISTINCT) (bridge: distinct over scaled
    * longs so the distinct set and the sum are both exact).
    */
  def distinctAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_suppkey").as("n_supp"),
        countDistinct($"l_partkey", $"l_suppkey").as("n_part_supp"),
        (sum_distinct(round($"l_quantity" * 10000.0).cast("long")).cast("double") / 10000.0)
          .as("sum_distinct_qty"))
      .orderBy($"l_returnflag")
  }

  private val distinctAggSql =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_suppkey) AS n_supp,
      |  COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp,
      |  CAST(CAST(SUM(DISTINCT CAST(round(l_quantity * 10000.0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 10000.0
      |    AS sum_distinct_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** approx_count_distinct (HLL++). Sketch internals differ from
    * DuckDB's, so the estimate itself can't be hash-compared — instead
    * the query emits the exact count plus a deterministic
    * `within_tol` bound (|approx − exact| ≤ 5%·exact, 2.5× the
    * configured 2% rsd) that the oracle asserts as TRUE. The scale
    * story: constant memory per group vs exact distinct's shuffle of
    * all keys.
    */
  def approxDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        approx_count_distinct($"l_partkey", 0.02).as("approx_parts"),
        countDistinct($"l_partkey").as("exact_parts"))
      .select($"l_returnflag", $"exact_parts",
        (abs($"approx_parts" - $"exact_parts").cast("double") <=
          $"exact_parts".cast("double") * 0.05).as("within_tol"))
      .orderBy($"l_returnflag")
  }

  private val approxDistinctSql =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
      |  TRUE AS within_tol
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Approximate quantiles (Spark's GK-style approx_percentile sketch)
    * vs the exact median — completing the sketch family (HLL++
    * distinct, KMV distinct, quantile). Mergeable constant-memory state
    * per group vs exact percentile's full sort. Sketch internals are
    * engine-specific, so like [[approxDistinct]] the emitted row is the
    * exact value plus a `within_tol` boolean: accuracy 1000 bounds rank
    * error at 0.1% of rows, so the approx median's VALUE lies between
    * neighboring order statistics — a 2% relative band is generous for
    * this price distribution and deterministic on both engines.
    */
  def approxPercentile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        percentile_approx($"l_extendedprice", lit(0.5), lit(1000)).as("approx_med"),
        expr("percentile(l_extendedprice, 0.5)").as("exact_med"))
      .select($"l_returnflag",
        // ×200, not ×100: an even-sized group's median is the midpoint of
        // two 2-decimal prices, so ×100 can land exactly on a half-cent
        // where a one-ulp lerp difference between engines flips round();
        // ×200 is always within ulps of an INTEGER, making round() stable.
        round($"exact_med" * 200).cast("long").as("exact_med_halfcents"),
        (abs($"approx_med" - $"exact_med") <= $"exact_med" * 0.02).as("within_tol"))
      .orderBy($"l_returnflag")
  }

  private val approxPercentileSql =
    """SELECT l_returnflag,
      |  CAST(round(quantile_cont(l_extendedprice, 0.5) * 200) AS BIGINT) AS exact_med_halfcents,
      |  TRUE AS within_tol
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** KMV distinct sketch (custom TypedImperativeAggregate,
    * graft.functions.KmvDistinct): constant k-longs memory per group vs
    * exact distinct's full key shuffle. Sketch hashing is
    * engine-specific, so like [[approxDistinct]] the query emits the
    * exact count plus a `within_tol` bound (15% ≈ 3.4σ for k=512,
    * rsd ≈ 1/√k = 4.4%) the oracle asserts as TRUE.
    */
  def kmvDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftExtensions.register(s)
    Tables.t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        expr("kmv_distinct(l_partkey, 512)").as("kmv_parts"),
        countDistinct($"l_partkey").as("exact_parts"))
      .select($"l_returnflag", $"exact_parts",
        (abs($"kmv_parts" - $"exact_parts").cast("double") <=
          $"exact_parts".cast("double") * 0.15).as("within_tol"))
      .orderBy($"l_returnflag")
  }

  private val kmvDistinctSql =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
      |  TRUE AS within_tol
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Incremental sketch rollup — the store-states-merge-later pattern
    * (graft.functions.{KmvState,KmvMerge}): per-day KMV states of the
    * weekly-active-user set are built once (the daily job), then the
    * weekly distinct count comes from merging the 7 stored binary
    * states — NEVER rescanning the day's raw events. Two gate flags:
    * `merge_lossless` pins the algebraic invariant — merging stored
    * day states reproduces the single-shot weekly sketch EXACTLY
    * (the k minima of a union of per-part k-minima ARE the union's k
    * minima; deterministic because xxhash64 is, so true at EVERY
    * scale, below or above k) — and `within_tol` bounds the estimate
    * against the exact count (15 % ≈ 3.4σ for k=1024, the
    * [[kmvDistinct]] gate convention, since above k the estimate is
    * an approximation whose exact value is engine-specific). At
    * 100 TB: daily states are k longs per group; week/month/quarter
    * rollups all read states, making reporting O(#days), not
    * O(history·events).
    */
  def sketchRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftExtensions.register(s)
    val daily = Tables.t(s, dir, "events")
      .select(expr("CAST(ts AS LONG) div 604800").as("wk"),
        expr("CAST(ts AS LONG) div 86400").as("day"), $"user_id")
      .groupBy($"wk", $"day")
      .agg(expr("kmv_state(user_id)").as("state"))
    daily.groupBy($"wk")
      .agg(expr("kmv_merge(state)").as("merged"),
        count(lit(1)).as("n_days"))
      .join(
        Tables.t(s, dir, "events")
          .select(expr("CAST(ts AS LONG) div 604800").as("wk"), $"user_id")
          .groupBy($"wk").agg(countDistinct($"user_id").as("exact_users"),
            expr("kmv_distinct(user_id)").as("direct")),
        Seq("wk"))
      .select($"wk", $"n_days", $"exact_users",
        ($"merged" === $"direct").as("merge_lossless"),
        (abs($"merged" - $"exact_users").cast("double") <=
          $"exact_users".cast("double") * 0.15).as("within_tol"))
      .orderBy($"wk")
  }

  private val sketchRollupSql =
    """WITH d AS (
      |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk,
      |         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day, user_id
      |  FROM events)
      |SELECT wk, COUNT(DISTINCT day) AS n_days,
      |  COUNT(DISTINCT user_id) AS exact_users,
      |  TRUE AS merge_lossless, TRUE AS within_tol
      |FROM d GROUP BY wk ORDER BY wk""".stripMargin

  /** Re-aggregatable QUANTILE rollup — the order-statistics sibling of
    * [[sketchRollup]]: per (event_type, day) a
    * [[graft.functions.BksState]] bottom-k row sample (k=256 pairs of
    * longs, map-side combined), merged per event_type by
    * [[graft.functions.BksQuantileMerge]] into p50/p90 estimates of
    * the integer-bridged value — daily stored states answer later
    * quantile queries without rescanning history, the same O(day) vs
    * O(history) trade as the KMV row but for percentiles (bottom-k
    * sketches: Cohen & Kaplan 2007; merging bottom-k samples is
    * lossless, BkSampleSpec asserts merged ≡ single-shot ≡ exact-≤-k).
    *
    * Unlike the KMV row (whose xxhash64 forces a weaker TRUE-column
    * oracle), the sample priority here is the catalog's cross-engine
    * Knuth hash (`q_sample_weighted`'s reduce-before-multiply form,
    * mod 2^40), so DuckDB rebuilds the SAME sample and the estimates
    * gate EXACTLY — priority ties (birthday-rare at 2^40 but mirrored
    * anyway) keep the smaller value in both engines. Estimator:
    * lower quantile of the sampled values at index (n−1)·p div 1000 —
    * exact when the group has ≤ k rows, √(p(1−p)/k)-order error
    * beyond. At 100 TB the shuffle after the scan carries ≤ k pairs
    * per (event_type, day), never rows — and a year of stored daily
    * states re-aggregates to any window's percentiles in one
    * metadata-sized job.
    */
  def quantileRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftExtensions.register(s)
    val e = Tables.t(s, dir, "events")
      .select($"event_type",
        expr("CAST(ts AS LONG) div 86400").as("day"),
        expr("pmod(pmod(event_id, 2654435761) * 2654435761, 1099511627776)")
          .as("prio"),
        round($"value" * lit(1e4)).cast("long").as("mills"))
    val daily = e.groupBy($"event_type", $"day")
      .agg(expr("bks_state(prio, mills)").as("state"), count(lit(1)).as("n"))
    daily.groupBy($"event_type")
      .agg(expr("bks_quantile_merge(state, 500)").as("est_p50_mills"),
        expr("bks_quantile_merge(state, 900)").as("est_p90_mills"),
        count(lit(1)).as("n_days"), sum($"n").as("n_rows"))
      .orderBy($"event_type")
  }

  /** Oracle: rebuild the deterministic bottom-k sample relationally —
    * dedup priorities keeping the min value (the sketch's tie rule),
    * keep the k smallest priorities per group (merge losslessness
    * makes per-day-then-merge ≡ one global bottom-k), then pick the
    * sampled value at 1-based rank (n−1)·p div 1000 + 1. */
  private val quantileRollupSql =
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
      |    ((((event_id % 2654435761) + 2654435761) % 2654435761)
      |      * 2654435761) % 1099511627776 AS prio,
      |    CAST(round(value * 1e4) AS BIGINT) AS mills
      |  FROM events),
      |d AS (
      |  SELECT event_type, prio, MIN(mills) AS mills FROM e GROUP BY 1, 2),
      |r AS (
      |  SELECT event_type, prio, mills,
      |    row_number() OVER (PARTITION BY event_type ORDER BY prio) AS rn
      |  FROM d),
      |sv AS (
      |  SELECT event_type, mills,
      |    row_number() OVER (PARTITION BY event_type ORDER BY mills) AS vr,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM r WHERE rn <= 256),
      |q AS (
      |  SELECT event_type,
      |    MAX(CASE WHEN vr = (n - 1) * 500 // 1000 + 1 THEN mills END) AS est_p50_mills,
      |    MAX(CASE WHEN vr = (n - 1) * 900 // 1000 + 1 THEN mills END) AS est_p90_mills
      |  FROM sv GROUP BY 1),
      |meta AS (
      |  SELECT event_type, COUNT(DISTINCT day) AS n_days,
      |    COUNT(*) AS n_rows
      |  FROM e GROUP BY 1)
      |SELECT m.event_type, q.est_p50_mills, q.est_p90_mills,
      |  CAST(m.n_days AS BIGINT) AS n_days, CAST(m.n_rows AS BIGINT) AS n_rows
      |FROM meta m JOIN q ON m.event_type = q.event_type
      |ORDER BY m.event_type""".stripMargin

  /** Heavy-hitters with the deployment knobs exposed — the same
    * sizing contract [[graft.ops.Dedup.benchmarkBloom]] gained:
    * `capacity` ≥ the measured per-group distinct count keeps every
    * counter EXACT (the 10× fixture pushes per-language vocabulary to
    * ~600, past the gate's 64 — re-running there with capacity 1024
    * matches the exact oracle again, PLANS.md r11); below it the
    * sketch degrades gracefully within the Misra–Gries
    * N/(capacity+1) bound FreqTopKSpec asserts.
    */
  def heavyHittersOn(s: SparkSession, docs: DataFrame,
      k: Int, capacity: Int): DataFrame = {
    import s.implicits._
    graft.functions.GraftExtensions.register(s)
    docs
      .select($"lang", explode(split($"text", " ")).as("term"))
      .groupBy($"lang")
      .agg(expr(s"freq_topk(term, $k, $capacity)").as("top_terms"),
        count(lit(1)).as("n_tokens"))
      .orderBy($"lang")
  }

  /** Capacity auto-sizing for [[heavyHittersOn]] — the r11 sizing
    * decision (capacity ≥ vocabulary ⇒ every Misra–Gries counter
    * exact) folded INTO the operator instead of left to hand-tuning:
    * one cheap pre-pass estimates the largest per-group distinct-term
    * count with HLL++ (rsd 2%, constant state per group — the same
    * token stream the sketch pass reads, so at 100 TB this is one
    * extra map-side-combinable rollup, not a new data shape), then
    * capacity = the next power of two ≥ 1.5× the estimate — headroom
    * that makes an HLL underestimate ever exceeding it a >25σ event.
    * Bounded to [64, 2^20]: past a ~1M-counter summary per group the
    * honest tool is the exact (group, term) rollup, and the cap makes
    * that switch a loud size decision instead of silent memory creep.
    */
  private[graft] def heavyHittersAutoCapacity(s: SparkSession, docs: DataFrame): Int = {
    import s.implicits._
    val est = docs
      .select($"lang", explode(split($"text", " ")).as("term"))
      .groupBy($"lang").agg(approx_count_distinct($"term", 0.02).as("nv"))
      .agg(coalesce(max($"nv"), lit(0L))).head().getLong(0)
    val target = math.min(1L << 20, math.max(64L, est + (est >> 1)))
    java.lang.Integer.highestOneBit((2 * target - 1).toInt)
  }

  /** [[heavyHittersOn]] with the capacity chosen by
    * [[heavyHittersAutoCapacity]] — exact whenever the measured
    * vocabulary fits the auto-chosen power of two (the 10× fixture
    * that broke the hand-set 64 is exact again here with no tuning),
    * degrading within the documented Misra–Gries bound beyond it.
    */
  def heavyHittersAutoSized(s: SparkSession, docs: DataFrame, k: Int): DataFrame =
    heavyHittersOn(s, docs, k, heavyHittersAutoCapacity(s, docs))

  def heavyHittersAuto(s: SparkSession, dir: String): DataFrame =
    heavyHittersAutoSized(s, Tables.t(s, dir, "documents"), 5)

  private val heavyHittersSql =
    """WITH toks AS (
      |  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents),
      |c AS (SELECT lang, term, COUNT(*) AS n FROM toks GROUP BY 1, 2),
      |r AS (SELECT lang, term, n,
      |        row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rn
      |      FROM c)
      |SELECT lang,
      |  string_agg(term || ':' || n, ' ' ORDER BY rn) AS top_terms,
      |  (SELECT COUNT(*) FROM toks t WHERE t.lang = r.lang) AS n_tokens
      |FROM r WHERE rn <= 5 GROUP BY lang ORDER BY lang""".stripMargin

  /** Sketch-based join-size / overlap estimation — the optimizer-style
    * use of the KMV family: per-language token [[graft.functions.KmvState]]
    * sketches, then for every language PAIR the union cardinality from
    * one [[graft.functions.KmvMerge]] and the intersection by
    * inclusion–exclusion (|A∩B| = |A|+|B|−|A∪B|) — the standard
    * KMV set-operation estimator, and exactly how an engine estimates
    * equi-join output size from two column sketches without touching
    * row data. The pair join runs on the AGGREGATED per-language table
    * (|languages| rows — broadcast nested loop on purpose: the `<`
    * predicate is a triangular self-pair enumeration over bounded
    * metadata, the [[graft.ops.TextAnalysis.languageMixture]] shape,
    * not a data-volume join). Exact below k (the gate regime, vocab ≪
    * k=1024); above k the estimator inherits KMV's error, bounded in
    * KmvDistinctSpec.
    */
  def kmvIntersect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftExtensions.register(s)
    val perLang = Tables.t(s, dir, "documents")
      .select($"lang", explode(split($"text", " ")).as("term"))
      .groupBy($"lang")
      .agg(expr("kmv_state(term)").as("state"),
        expr("kmv_distinct(term)").as("nd"))
      .persistScoped()
    val pairs = perLang.as("a")
      .join(broadcast(perLang.as("b")), col("a.lang") < col("b.lang"))
      .select(col("a.lang").as("lang_a"), col("b.lang").as("lang_b"),
        col("a.nd").as("nd_a"), col("b.nd").as("nd_b"),
        col("a.state").as("sa"), col("b.state").as("sb"))
    pairs.select($"lang_a", $"lang_b", $"nd_a", $"nd_b", $"sa".as("state"))
      .unionByName(
        pairs.select($"lang_a", $"lang_b", $"nd_a", $"nd_b", $"sb".as("state")))
      .groupBy($"lang_a", $"lang_b", $"nd_a", $"nd_b")
      .agg(expr("kmv_merge(state)").as("union_est"))
      .select($"lang_a", $"lang_b", $"nd_a", $"nd_b", $"union_est",
        ($"nd_a" + $"nd_b" - $"union_est").as("intersect_est"))
      .orderBy($"lang_a", $"lang_b")
  }

  private val kmvIntersectSql =
    """WITH toks AS (
      |  SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |n AS (SELECT lang, COUNT(*) AS nd FROM toks GROUP BY 1),
      |p AS (SELECT a.lang AS la, a.nd AS na, b.lang AS lb, b.nd AS nb
      |      FROM n a JOIN n b ON a.lang < b.lang),
      |u AS (SELECT p.la, p.lb,
      |        COUNT(DISTINCT t.term) AS un
      |      FROM p JOIN toks t ON t.lang IN (p.la, p.lb) GROUP BY 1, 2)
      |SELECT p.la AS lang_a, p.lb AS lang_b,
      |  p.na AS nd_a, p.nb AS nd_b, u.un AS union_est,
      |  p.na + p.nb - u.un AS intersect_est
      |FROM p JOIN u ON p.la = u.la AND p.lb = u.lb
      |ORDER BY lang_a, lang_b""".stripMargin

  /** CUBE with grouping() flags. */
  def cubeAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "lineitem")
      .cube($"l_returnflag", $"l_linestatus")
      .agg(
        count(lit(1)).as("n"),
        dsum($"l_quantity").as("sum_qty"),
        grouping($"l_returnflag").cast("int").as("g_flag"),
        grouping($"l_linestatus").cast("int").as("g_status"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  private val cubeAggSql =
    s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       |  ${dsumSql("l_quantity")} AS sum_qty,
       |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       |  CAST(GROUPING(l_linestatus) AS INT) AS g_status
       |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
       |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** ROLLUP over a two-level hierarchy. */
  def rollupAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "orders")
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  private val rollupAggSql =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       |  ${dsumSql("o_totalprice")} AS total
       |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
       |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** GROUPING SETS (SQL path — the DataFrame API has no direct form;
    * exercises the spark.sql entry the reference's SQL-transform step
    * maps to, SURVEY.md §2.A A10).
    */
  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.t(s, dir, "orders").createOrReplaceTempView("orders_gs")
    s.sql(
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |  ${dsumSql("o_totalprice")} AS total
         |FROM orders_gs
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  private val groupingSetsSql =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       |  ${dsumSql("o_totalprice")} AS total
       |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
       |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** HAVING ≅ post-aggregation filter. */
  def havingAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "orders")
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total"))
      .filter($"n_orders" >= 15 && $"total" > 2500000.0)
      .orderBy($"o_custkey")
  }

  private val havingAggSql =
    s"""SELECT o_custkey, COUNT(*) AS n_orders, ${dsumSql("o_totalprice")} AS total
       |FROM orders GROUP BY o_custkey
       |HAVING COUNT(*) >= 15 AND ${dsumSql("o_totalprice")} > 2500000.0
       |ORDER BY o_custkey""".stripMargin

  /** Statistical aggregates — computed from exact bridged moments so
    * Spark and DuckDB agree bit-for-bit (built-in stddev/corr are
    * summation-order-dependent).
    */
  def statsAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = count(lit(1)).cast("double")
    val sx = dsum($"l_quantity", 4)
    val sxx = dsum($"l_quantity" * $"l_quantity", 4)
    val sy = dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4)
    val syy = dsum(($"l_extendedprice" * (lit(1.0) - $"l_discount")) *
      ($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
    val sxy = dsum($"l_quantity" * ($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2)
    Tables.t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        ((sxx - sx * sx / n) / (n - lit(1.0))).as("var_qty"),
        sqrt((sxx - sx * sx / n) / (n - lit(1.0))).as("stddev_qty"),
        ((sxy - sx * sy / n) /
          sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))).as("corr_qty_rev"))
      .orderBy($"l_returnflag")
  }

  private val statsAggSql = {
    val n = "CAST(COUNT(*) AS DOUBLE)"
    val sx = dsumSql("l_quantity", 4)
    val sxx = dsumSql("l_quantity * l_quantity", 4)
    val sy = dsumSql("l_extendedprice * (1.0 - l_discount)", 4)
    val syy = dsumSql("(l_extendedprice * (1.0 - l_discount)) * (l_extendedprice * (1.0 - l_discount))", 2)
    val sxy = dsumSql("l_quantity * (l_extendedprice * (1.0 - l_discount))", 2)
    s"""SELECT l_returnflag,
       |  (($sxx - $sx * $sx / $n) / ($n - 1.0)) AS var_qty,
       |  sqrt(($sxx - $sx * $sx / $n) / ($n - 1.0)) AS stddev_qty,
       |  (($sxy - $sx * $sy / $n) /
       |    sqrt(($sxx - $sx * $sx / $n) * ($syy - $sy * $sy / $n))) AS corr_qty_rev
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  }

  /** Exact percentiles (Spark `percentile` ≙ DuckDB `quantile_cont`;
    * both linear-interpolate at rank p*(n-1)). Emitted in MILLS
    * (×1000), the same ulp-guard as [[approxPercentile]]'s half-cents:
    * o_totalprice sits on the cent grid and the lerp fraction of
    * p=0.5/0.9 is a multiple of 0.1, so the true value is a multiple
    * of a tenth of a cent and round(×1000) is within ulps of an
    * INTEGER on both engines — a one-ulp difference in the engines'
    * lerp can never flip the gate, on any fixture.
    */
  def percentileAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)") * 1000).cast("long").as("p50_mills"),
        round(expr("percentile(o_totalprice, 0.9)") * 1000).cast("long").as("p90_mills"))
      .orderBy($"o_orderpriority")
  }

  private val percentileAggSql =
    """SELECT o_orderpriority,
      |  CAST(round(quantile_cont(o_totalprice, 0.5) * 1000) AS BIGINT) AS p50_mills,
      |  CAST(round(quantile_cont(o_totalprice, 0.9) * 1000) AS BIGINT) AS p90_mills
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Boolean aggregates + conditional count. */
  def boolAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        bool_and($"l_quantity" > 0.0).as("all_positive"),
        bool_or($"l_discount" > 0.09).as("any_big_discount"),
        count_if($"l_tax" > 0.05).as("n_high_tax"))
      .orderBy($"l_returnflag")
  }

  private val boolAggSql =
    """SELECT l_returnflag,
      |  bool_and(l_quantity > 0.0) AS all_positive,
      |  bool_or(l_discount > 0.09) AS any_big_discount,
      |  CAST(SUM(CASE WHEN l_tax > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_tax
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Ordered string aggregation (LISTAGG/STRING_AGG). */
  def stringAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "nation")
      .groupBy($"n_regionkey")
      .agg(concat_ws(",", sort_array(collect_list($"n_name"))).as("nations"))
      .orderBy($"n_regionkey")
  }

  private val stringAggSql =
    """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  /** collect_set / collect_list into deterministic (sorted) arrays,
    * serialized to csv strings in the final projection — the driver's
    * pandas-based oracle compare can't hash raw array cells, and a
    * csv of the sorted elements carries the identical signal.
    */
  def collectAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "lineitem")
      .filter($"l_orderkey" < 100)
      .groupBy($"l_orderkey")
      .agg(
        concat_ws(",", sort_array(collect_set($"l_linenumber")).cast("array<string>"))
          .as("linenumbers"),
        concat_ws(",", sort_array(collect_list($"l_returnflag"))).as("flags"))
      .orderBy($"l_orderkey")
  }

  private val collectAggSql =
    """SELECT l_orderkey,
      |  array_to_string(list_sort(list(DISTINCT l_linenumber)), ',') AS linenumbers,
      |  array_to_string(list_sort(list(l_returnflag)), ',') AS flags
      |FROM lineitem WHERE l_orderkey < 100
      |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin

  /** Custom typed Aggregator (UDAF surface): discount-weighted mean
    * price per returnflag via functions.udaf(WeightedMean). The
    * aggregator buffers scaled longs (integer bridge) so the oracle
    * reproduces it exactly in SQL.
    */
  def udafWeightedMean(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wmean = udaf(graft.functions.Udafs.WeightedMean)
    Tables.t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(wmean($"l_extendedprice", $"l_discount").as("disc_weighted_price"))
      .orderBy($"l_returnflag")
  }

  private val udafWeightedMeanSql =
    """SELECT l_returnflag,
      |  CAST(CAST(SUM(CAST(round(l_discount * l_extendedprice * 1e4) AS BIGINT)) AS BIGINT) AS DOUBLE)
      |    / CAST(CAST(SUM(CAST(round(l_discount * 1e4) AS BIGINT)) AS BIGINT) AS DOUBLE)
      |    AS disc_weighted_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** argmax/argmin with a DETERMINISTIC tie-break: smallest key among
    * the rows attaining the extreme. A bare max_by/arg_max orders by
    * the raw measure alone, which is only deterministic while no two
    * rows tie — true at the gate fixture, FALSE the moment data
    * replicates (the 10× ScaleUp fixture creates exact price ties
    * across replicas and the engines then legitimately disagree).
    * Neither engine can tie-break portably in one aggregate (DuckDB
    * 1.0 arg_max can't compare structs), so the deterministic form is
    * extreme-then-resolve: a ≤|groups|-row extremes table broadcast
    * back over the scan, keys resolved by min(CASE WHEN measure =
    * extreme). Two passes over the scan, one broadcast — the shape
    * survives any tie structure at any scale.
    */
  def argMax(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.t(s, dir, "orders")
    val ext = o.groupBy($"o_orderpriority")
      .agg(max($"o_totalprice").as("mx"), min($"o_totalprice").as("mn"))
    o.join(broadcast(ext), Seq("o_orderpriority"))
      .groupBy($"o_orderpriority")
      .agg(
        min(when($"o_totalprice" === $"mx", $"o_orderkey")).as("biggest_order"),
        min(when($"o_totalprice" === $"mn", $"o_orderkey")).as("smallest_order"),
        max($"o_totalprice").as("max_price"))
      .orderBy($"o_orderpriority")
  }

  private val argMaxSql =
    """WITH ext AS (
      |  SELECT o_orderpriority, max(o_totalprice) AS mx, min(o_totalprice) AS mn
      |  FROM orders GROUP BY 1)
      |SELECT o.o_orderpriority,
      |  min(CASE WHEN o_totalprice = mx THEN o_orderkey END) AS biggest_order,
      |  min(CASE WHEN o_totalprice = mn THEN o_orderkey END) AS smallest_order,
      |  max(o_totalprice) AS max_price
      |FROM orders o JOIN ext USING (o_orderpriority)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Numeric histogram via width_bucket: order totals into 20 equal
    * bins over [0, 600000) plus the under/overflow buckets — the
    * standard distribution-profiling aggregate. Bucket ids are exact
    * integers from one comparison ladder, identical cross-engine; one
    * hash-aggregate shuffle on the bucket id.
    */
  def histogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "orders")
      .select(width_bucket($"o_totalprice", lit(0.0), lit(600000.0), lit(20)).as("bucket"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy($"bucket")
  }

  // DuckDB 1.0 has no width_bucket — the oracle spells out its
  // definition (0 underflow, n+1 overflow, else floor((x-lo)/w)+1).
  // Money values sit ≥ 3e-7 from any bucket boundary, far above double
  // ulp, so the two formulations can't disagree on a bucket.
  private val histogramSql =
    """SELECT CAST(CASE WHEN o_totalprice < 0.0 THEN 0
      |                 WHEN o_totalprice >= 600000.0 THEN 21
      |                 ELSE floor(o_totalprice / 30000.0) + 1 END AS BIGINT) AS bucket,
      |  COUNT(*) AS n
      |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin

  /** Deterministic per-group MODE — most frequent value with a total
    * tiebreak (highest count, then lexicographically smallest value),
    * because engine-native `mode()` leaves ties unspecified and would
    * flip the gate hash. Two narrow hash aggregations — (group, value)
    * counts re-rolled to the group key via the struct-min trick
    * (min over (−count, value) IS argmax-count-then-min-value, no
    * per-group sort, no window) — both map-side-combinable, so the
    * value-distinct shuffle is the only real data movement at 100 TB.
    */
  def modeAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "orders")
      .groupBy($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
      .groupBy($"o_orderstatus")
      .agg(min(struct((-$"cnt").as("neg"), $"o_orderpriority".as("v"))).as("m"))
      .select($"o_orderstatus", $"m.v".as("mode_priority"), (-$"m.neg").as("n"))
      .orderBy($"o_orderstatus")
  }

  /** Oracle: independent row_number-window formulation of the same
    * count-desc-value-asc total order. */
  private val modeAggSql =
    """WITH c AS (
      |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
      |  FROM orders GROUP BY 1, 2),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY o_orderstatus
      |      ORDER BY cnt DESC, o_orderpriority ASC) AS rn FROM c)
      |SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt AS n
      |FROM r WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin

  def entries: Seq[CatalogEntry] = Seq(
    CatalogEntry("q_agg_mode", modeAgg, Some(modeAggSql)),
    CatalogEntry("q_agg_approx_percentile", approxPercentile, Some(approxPercentileSql)),
    CatalogEntry("q_agg_histogram", histogram, Some(histogramSql)),
    CatalogEntry("q_agg_multi", multiAgg, Some(multiAggSql)),
    CatalogEntry("q_agg_argmax", argMax, Some(argMaxSql)),
    CatalogEntry("q_udaf_weighted_mean", udafWeightedMean, Some(udafWeightedMeanSql)),
    CatalogEntry("q_agg_distinct", distinctAgg, Some(distinctAggSql)),
    CatalogEntry("q_agg_approx_distinct", approxDistinct, Some(approxDistinctSql)),
    CatalogEntry("q_agg_kmv_distinct", kmvDistinct, Some(kmvDistinctSql)),
    CatalogEntry("q_agg_sketch_rollup", sketchRollup, Some(sketchRollupSql)),
    CatalogEntry("q_agg_quantile_rollup", quantileRollup, Some(quantileRollupSql)),
    // The fixed-capacity twin of q_agg_heavy_hitters_auto was retired
    // in r13 (verdict #2): fixture vocabulary grows linearly with
    // scale (measured 31 → 310 → 930 at 1×/10×/30×), so ANY pinned
    // capacity eventually re-enters the approximate regime and the
    // sweep carries a permanent asterisk. The Misra–Gries sketch
    // itself — eviction, merge trim, the N/(capacity+1) bound — stays
    // owned by FreqTopKSpec; heavyHittersOn keeps the explicit
    // capacity knob for deployments that want to pin it.
    CatalogEntry("q_agg_heavy_hitters_auto", heavyHittersAuto, Some(heavyHittersSql)),
    CatalogEntry("q_agg_kmv_intersect", kmvIntersect, Some(kmvIntersectSql)),
    CatalogEntry("q_agg_cube", cubeAgg, Some(cubeAggSql)),
    CatalogEntry("q_agg_rollup", rollupAgg, Some(rollupAggSql)),
    CatalogEntry("q_agg_grouping_sets", groupingSets, Some(groupingSetsSql)),
    CatalogEntry("q_agg_bool", boolAgg, Some(boolAggSql)),
    CatalogEntry("q_agg_stringagg", stringAgg, Some(stringAggSql)),
    CatalogEntry("q_agg_having", havingAgg, Some(havingAggSql)),
    CatalogEntry("q_agg_stats", statsAgg, Some(statsAggSql)),
    CatalogEntry("q_agg_percentile", percentileAgg, Some(percentileAggSql)),
    CatalogEntry("q_agg_collect", collectAgg, Some(collectAggSql)))
}
