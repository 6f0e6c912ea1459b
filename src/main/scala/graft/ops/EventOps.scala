package graft.ops

import graft.{CatalogEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.CacheScope.Scoped

/** Event-table operators: the batch twins of the streaming surface
  * (SURVEY.md §2.B "Streaming"). The same transformations run under
  * Structured Streaming in graft.streaming (readStream + watermark);
  * here they execute on the static events table so the DuckDB oracle
  * can check the semantics. The reference has no streaming at all — its
  * "stream" is a 30 s polling scheduler (reference:
  * scheduler/scheduler.py:49-56).
  */
object EventOps {

  /** Tumbling 10-minute window aggregation (epoch-aligned, exactly what
    * `groupBy(window($"ts","10 minutes"))` produces in a stream).
    */
  def tumbling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "events")
      .groupBy(window($"ts", "10 minutes").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
      .select($"w.start".as("win_start"), $"event_type", $"n", $"sum_value")
      .orderBy($"win_start", $"event_type")
  }

  private val tumblingSql =
    s"""SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 600) * 600 AS BIGINT)) AS TIMESTAMP) AS win_start,
       |  event_type, COUNT(*) AS n, ${dsumSql("value")} AS sum_value
       |FROM events
       |GROUP BY 1, event_type ORDER BY win_start, event_type""".stripMargin

  /** Sliding window (10 min length, 5 min slide): each event lands in 2
    * windows — Spark expands via the window generator; the oracle unions
    * the two phase-shifted assignments.
    */
  def sliding(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "events")
      .groupBy(window($"ts", "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select($"w.start".as("win_start"), $"n")
      .orderBy($"win_start")
  }

  private val slidingSql =
    """SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 300) * 300 - o.off AS BIGINT)) AS TIMESTAMP) AS win_start,
      |  COUNT(*) AS n
      |FROM events, (VALUES (0), (300)) AS o(off)
      |WHERE floor(epoch(ts) / 300) * 300 - o.off >= 0
      |GROUP BY 1 ORDER BY win_start""".stripMargin

  /** Session windows (5-minute gap) per user — batch twin of
    * `session_window($"ts", "5 minutes")`. Oracle replays the merge with
    * gaps-and-islands (lag + cumulative flag sum).
    */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "events")
      .groupBy(session_window($"ts", "5 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
      .select($"user_id", $"w.start".as("sess_start"), $"w.end".as("sess_end"),
        $"n_events", $"sum_value")
      .orderBy($"user_id", $"sess_start")
  }

  private val sessionizeSql =
    s"""WITH flagged AS (
       |  SELECT user_id, ts, value,
       |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
       |           OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 300000000
       |         THEN 1 ELSE 0 END AS new_sess
       |  FROM events),
       |sess AS (
       |  SELECT user_id, ts, value,
       |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
       |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM flagged)
       |SELECT user_id,
       |  CAST(min(ts) AS TIMESTAMP) AS sess_start,
       |  CAST(max(ts) + INTERVAL 5 MINUTE AS TIMESTAMP) AS sess_end,
       |  COUNT(*) AS n_events, ${dsumSql("value")} AS sum_value
       |FROM sess GROUP BY user_id, sid
       |ORDER BY user_id, sess_start""".stripMargin

  /** Deduplication by business key keeping the earliest event — the
    * batch twin of streaming `dropDuplicates` with watermark.
    */
  def eventDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts".asc, $"event_id".asc)
    Tables.t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type", $"event_id", $"ts")
      .orderBy($"user_id", $"event_type")
  }

  private val eventDedupSql =
    """SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts FROM (
      |  SELECT user_id, event_type, event_id, ts,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts ASC, event_id ASC) AS rn
      |  FROM events) t
      |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  /** Stream-static join shape: events (stream side) joined to the
    * customer dimension (static side, broadcast).
    */
  def streamStaticJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.t(s, dir, "events")
    val c = Tables.t(s, dir, "customer")
    e.join(broadcast(c), e("user_id") === c("c_custkey"))
      .groupBy($"c_mktsegment", $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
      .orderBy($"c_mktsegment", $"event_type")
  }

  private val streamStaticJoinSql =
    s"""SELECT c_mktsegment, event_type, COUNT(*) AS n, ${dsumSql("value")} AS sum_value
       |FROM events JOIN customer ON user_id = c_custkey
       |GROUP BY c_mktsegment, event_type ORDER BY c_mktsegment, event_type""".stripMargin

  /** Conversion funnel view → click → purchase per user: each stage's
    * timestamp is the earliest qualifying event strictly AFTER the
    * previous stage (the standard ordered-funnel semantics, not mere
    * set membership). Three windowed conditional minima over the SAME
    * user partitioning — Catalyst plans one exchange with stacked
    * WindowExecs, so the whole funnel costs a single shuffle of the
    * events table at any scale. The oracle replays the stages as three
    * dependent aggregates, an independent formulation.
    */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
    Tables.t(s, dir, "events")
      .select($"user_id", $"event_type", $"ts")
      .withColumn("t_view",
        min(when($"event_type" === "view", $"ts")).over(w))
      .withColumn("t_click",
        min(when($"event_type" === "click" && $"ts" > $"t_view", $"ts")).over(w))
      .withColumn("t_purchase",
        min(when($"event_type" === "purchase" && $"ts" > $"t_click", $"ts")).over(w))
      .groupBy($"user_id")
      .agg(min($"t_view").as("t_view"), min($"t_click").as("t_click"),
        min($"t_purchase").as("t_purchase"))
      .withColumn("funnel_stage",
        when($"t_purchase".isNotNull, 3L).when($"t_click".isNotNull, 2L)
          .when($"t_view".isNotNull, 1L).otherwise(0L))
      .orderBy($"user_id")
  }

  private val funnelSql =
    """WITH t1 AS (
      |  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
      |  FROM events GROUP BY 1),
      |t2 AS (
      |  SELECT e.user_id,
      |    min(CASE WHEN event_type = 'click' AND e.ts > t1.t_view THEN e.ts END) AS t_click
      |  FROM events e JOIN t1 USING (user_id) GROUP BY 1),
      |t3 AS (
      |  SELECT e.user_id,
      |    min(CASE WHEN event_type = 'purchase' AND e.ts > t2.t_click THEN e.ts END) AS t_purchase
      |  FROM events e JOIN t2 USING (user_id) GROUP BY 1)
      |SELECT t1.user_id,
      |  CAST(t_view AS TIMESTAMP) AS t_view,
      |  CAST(t_click AS TIMESTAMP) AS t_click,
      |  CAST(t_purchase AS TIMESTAMP) AS t_purchase,
      |  CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
      |            WHEN t_click IS NOT NULL THEN 2
      |            WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS funnel_stage
      |FROM t1 JOIN t2 USING (user_id) JOIN t3 USING (user_id)
      |ORDER BY user_id""".stripMargin

  /** Click→purchase attribution: each purchase joined to the same
    * user's clicks within the preceding 10 minutes — the batch twin of
    * the watermarked stream-stream interval join
    * (streaming.StreamOps.attributeClicks; StreamOpsSpec proves
    * batch/stream parity). The plan is a hash/merge EQUI-join on
    * user_id with the interval as a residual condition — state/fan-out
    * bounded per user by the time range, never a nested loop.
    */
  def attribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.t(s, dir, "events")
    graft.streaming.StreamOps.attributeClicks(
      e.filter($"event_type" === "click"),
      e.filter($"event_type" === "purchase"), windowMinutes = 10)
      .orderBy($"purchase_id", $"click_id")
  }

  private val attributionSql =
    """SELECT p.user_id,
      |  p.event_id AS purchase_id, CAST(p.ts AS TIMESTAMP) AS purchase_ts,
      |  c.event_id AS click_id, CAST(c.ts AS TIMESTAMP) AS click_ts
      |FROM events p JOIN events c
      |  ON p.user_id = c.user_id
      |  AND p.event_type = 'purchase' AND c.event_type = 'click'
      |  AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts <= p.ts
      |ORDER BY purchase_id, click_id""".stripMargin

  /** Clicks-per-user cap for [[attributionCapped]]. */
  val attributionLastN = 5

  /** [[attribution]] with the zipfian-head mitigation the skew bench
    * demanded: the raw interval join's OUTPUT grows as clicks×purchases
    * per user (the hot-key fixture measured 460 → 83k result rows,
    * 181×, while per-row cost was flat — output-bound, not
    * shuffle-bound). Capping each user to their `lastN` most recent
    * clicks BEFORE the join (row_number over the per-user time order,
    * newest first) bounds join fan-out to ≤ lastN rows per purchase, so
    * a hot user's output is linear in their purchases, never quadratic.
    * The row_number window needs the same user_id hash partitioning as
    * the join, so the cap rides the click side's existing exchange —
    * no new shuffle.
    */
  def attributionCapped(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.t(s, dir, "events")
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    val clicks = e.filter($"event_type" === "click")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= attributionLastN).drop("rn")
    graft.streaming.StreamOps.attributeClicks(
      clicks, e.filter($"event_type" === "purchase"), windowMinutes = 10)
      .orderBy($"purchase_id", $"click_id")
  }

  private val attributionCappedSql =
    s"""WITH c AS (
       |  SELECT user_id, event_id, ts,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM events WHERE event_type = 'click')
       |SELECT p.user_id,
       |  p.event_id AS purchase_id, CAST(p.ts AS TIMESTAMP) AS purchase_ts,
       |  c.event_id AS click_id, CAST(c.ts AS TIMESTAMP) AS click_ts
       |FROM events p JOIN c ON p.user_id = c.user_id
       |WHERE p.event_type = 'purchase' AND c.rn <= $attributionLastN
       |  AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts <= p.ts
       |ORDER BY purchase_id, click_id""".stripMargin

  /** Cohort retention — the growth-analytics staple: users bucketed by
    * first-active week (cohort), counted in each later week they
    * remain active, as (cohort, week_offset, n_users). Week index is
    * INTEGER floor-division of whole epoch seconds (`div` in Spark,
    * `floor(epoch())` then `//` in DuckDB) — fractional-second double
    * division could flip a week boundary by one ulp, the same hazard
    * the approx-percentile half-cent fix guards.
    *
    * Shuffle shape at 100 TB: distinct (user, week) activity first —
    * partial map-side dedup collapses each user's events before the
    * one user-keyed shuffle; cohort = min(week) per user reuses that
    * partitioning; the final (cohort, offset) rollup is
    * cardinality-bounded by weeks², tiny.
    */
  def retention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val act = Tables.t(s, dir, "events")
      .select($"user_id", expr("CAST(ts AS LONG) div 604800").as("wk"))
      .distinct()
    val cohorts = act.groupBy($"user_id").agg(min($"wk").as("cohort"))
    act.join(cohorts, Seq("user_id"))
      .groupBy($"cohort", ($"wk" - $"cohort").as("week_offset"))
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"cohort", $"week_offset")
  }

  private val retentionSql =
    """WITH act AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk FROM events),
      |coh AS (SELECT user_id, min(wk) AS cohort FROM act GROUP BY 1)
      |SELECT cohort, wk - cohort AS week_offset,
      |  COUNT(DISTINCT a.user_id) AS n_users
      |FROM act a JOIN coh USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort, week_offset""".stripMargin

  /** Event-type transition matrix — the first-order Markov table
    * (from_type, to_type, count, P(to|from)) behavioral models and
    * anomaly detectors consume. One lead() over the per-user time
    * order (same single user_id exchange as the funnel; event_id
    * breaks ts ties identically on both engines), then two
    * cardinality-bounded rollups (|event_types|² rows). The
    * denominator re-aggregates the transition counts, so each row of
    * P sums to 1 by construction; counts exact longs, P one IEEE
    * division.
    */
  def transitions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val pairs = Tables.t(s, dir, "events")
      .select($"user_id", $"event_type", $"ts", $"event_id")
      .withColumn("to_type", lead($"event_type", 1).over(w))
      .filter($"to_type".isNotNull)
    val c2 = pairs.groupBy($"event_type".as("from_type"), $"to_type")
      .agg(count(lit(1)).as("cnt")).persistScoped()
    val c1 = c2.groupBy($"from_type").agg(sum($"cnt").as("tot"))
    c2.join(c1, Seq("from_type"))
      .select($"from_type", $"to_type", $"cnt",
        ($"cnt".cast("double") / $"tot").as("p"))
      .orderBy($"from_type", $"to_type")
  }

  private val transitionsSql =
    """WITH o AS (
      |  SELECT event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |c2 AS (
      |  SELECT event_type AS from_type, to_type, COUNT(*) AS cnt
      |  FROM o WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |c1 AS (SELECT from_type, CAST(SUM(cnt) AS BIGINT) AS tot FROM c2 GROUP BY 1)
      |SELECT from_type, to_type, cnt, CAST(cnt AS DOUBLE) / tot AS p
      |FROM c2 JOIN c1 USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin

  /** Rolling 7-day active users (WAU ending each day) — the sliding
    * DISTINCT that a naive range-join formulation turns into a nested
    * loop. Instead: dedup to (user, day) activity, then each activity
    * row EXPLODES into the 7 window-end days it contributes to — a
    * generator + hash aggregate, pure equi-shapes at any scale (7×
    * fan-out of the already-day-deduped table, far smaller than raw
    * events). Day index is integer floor-division of epoch seconds,
    * like [[retention]]'s weeks.
    */
  def rollingActive(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val act = Tables.t(s, dir, "events")
      .select($"user_id", expr("CAST(ts AS LONG) div 86400").as("day"))
      .distinct()
    act.withColumn("off", explode(sequence(lit(0), lit(6))))
      .select($"user_id", ($"day" + $"off").as("day"))
      .groupBy($"day")
      .agg(countDistinct($"user_id").as("wau"))
      .orderBy($"day")
  }

  private val rollingActiveSql =
    """WITH act AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events),
      |e AS (
      |  SELECT user_id, day + off AS day
      |  FROM act CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS off) o)
      |SELECT day, COUNT(DISTINCT user_id) AS wau
      |FROM e GROUP BY 1 ORDER BY day""".stripMargin

  /** Hourly spike (anomaly) detection — flag hours whose event count
    * exceeds 1.5× the trailing-24-observed-hours average (1.5 fires on
    * the fixture's Poisson-ish variation; a production 3× would flag
    * only true incidents — the threshold is the point, the machinery
    * is identical). The comparison is cross-multiplied into pure
    * integers (`48·cnt > 3·Σtrailing`),
    * so no float average ever reaches the gate. Two stages: one
    * map-side-combinable hourly rollup (the only full-data exchange),
    * then a ROWS-frame window over the POST-AGGREGATION hour table —
    * that table is bounded by the time range (720 rows/month, 8.8k/
    * year), so its single-partition window is a constant-size epilogue
    * like the funnel's, NOT a scale hazard (the SkewSpec post-agg
    * window rule). The cross-multiply assumes a FULL baseline, so
    * hours with fewer than 24 observed trailing hours are flagged
    * false — without this, warm-up hours misfire (a 1-hour baseline
    * divided by 24 undershoots the true average 24×). `trail_cnt` is
    * coalesced to 0 so the gate never carries a nullable sum.
    * (`trailing` is a reserved word in DuckDB — hence `trail_cnt`.)
    */
  def hourlySpikes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.orderBy($"hour").rowsBetween(-24, -1)
    Tables.t(s, dir, "events")
      .groupBy(date_trunc("hour", $"ts").as("hour"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("trail_cnt", coalesce(sum($"cnt").over(w), lit(0L)))
      .withColumn("n_trail", count($"cnt").over(w))
      .select($"hour", $"cnt", $"trail_cnt",
        ($"n_trail" === 24 && $"cnt" * 48 > $"trail_cnt" * 3).as("spike"))
      .orderBy($"hour")
  }

  private val hourlySpikesSql =
    """WITH h AS (
      |  SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS cnt
      |  FROM events GROUP BY 1),
      |t AS (
      |  SELECT hour, cnt,
      |    CAST(coalesce(SUM(cnt) OVER (ORDER BY hour
      |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS trail_cnt,
      |    COUNT(cnt) OVER (ORDER BY hour
      |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS n_trail
      |  FROM h)
      |SELECT hour, cnt, trail_cnt,
      |  n_trail = 24 AND cnt * 48 > trail_cnt * 3 AS spike
      |FROM t ORDER BY hour""".stripMargin

  /** RFM (recency / frequency / monetary) scoring — the classic
    * customer-value rollup, one hash aggregation on user_id with every
    * component engine-exact: recency is an integer day difference from
    * a fixed anchor date (2024-02-01, just past the fixture's event
    * range), frequency a count, monetary the integer-bridge sum of
    * event value ([[dsum]] — order-independent under partial
    * aggregation). Tier scores are fixed integer CASE thresholds, not
    * data-driven quantiles, so the row is a pure map of the rollup —
    * at 100 TB this is scan → one user-keyed exchange → tiny
    * projection, the cheapest possible per-entity feature table.
    */
  def rfm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "events")
      .groupBy($"user_id")
      .agg(datediff(lit("2024-02-01").cast("date"), max($"ts").cast("date"))
          .cast("long").as("recency_days"),
        count(lit(1)).as("frequency"),
        dsum($"value").as("monetary"))
      .select($"user_id", $"recency_days", $"frequency", $"monetary",
        when($"recency_days" <= 3, 3L).when($"recency_days" <= 10, 2L)
          .otherwise(1L).as("r_score"),
        when($"frequency" >= 20, 3L).when($"frequency" >= 10, 2L)
          .otherwise(1L).as("f_score"))
      .orderBy($"user_id")
  }

  private val rfmSql =
    s"""SELECT user_id,
       |  CAST(date_diff('day', CAST(max(ts) AS DATE), DATE '2024-02-01') AS BIGINT)
       |    AS recency_days,
       |  COUNT(*) AS frequency,
       |  ${dsumSql("value")} AS monetary,
       |  CAST(CASE WHEN date_diff('day', CAST(max(ts) AS DATE), DATE '2024-02-01') <= 3 THEN 3
       |       WHEN date_diff('day', CAST(max(ts) AS DATE), DATE '2024-02-01') <= 10 THEN 2
       |       ELSE 1 END AS BIGINT) AS r_score,
       |  CAST(CASE WHEN COUNT(*) >= 20 THEN 3
       |       WHEN COUNT(*) >= 10 THEN 2 ELSE 1 END AS BIGINT) AS f_score
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Hourly top event types via the [[graft.functions.FreqTopK]]
    * heavy-hitters sketch — the windowed form of `q_agg_heavy_hitters_auto`
    * and the shape a live dashboard aggregates: per tumbling hour, the
    * top-3 event types as one `type:count` string plus the window
    * volume. Exact regime (5 event types ≪ capacity 16), so the oracle
    * is plain exact counts + a row_number head. The point at 100 TB:
    * the wire carries ≤16 counters per hour window regardless of event
    * volume — the same partial-agg collapse as the per-language row —
    * and the SAME aggregate runs unchanged under Structured Streaming
    * (StreamOpsSpec pins the state-store round-trip).
    */
  def topTypesHourly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftExtensions.register(s)
    Tables.t(s, dir, "events")
      .groupBy(window($"ts", "1 hour").as("w"))
      .agg(expr("freq_topk(event_type, 3, 16)").as("top_types"),
        count(lit(1)).as("n"))
      .select($"w.start".as("win_start"), $"top_types", $"n")
      .orderBy($"win_start")
  }

  private val topTypesHourlySql =
    """WITH w AS (
      |  SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT))
      |           AS TIMESTAMP) AS win_start, event_type
      |  FROM events),
      |c AS (SELECT win_start, event_type, COUNT(*) AS n FROM w GROUP BY 1, 2),
      |r AS (SELECT win_start, event_type, n,
      |        row_number() OVER (PARTITION BY win_start ORDER BY n DESC, event_type) AS rn
      |      FROM c),
      |t AS (SELECT win_start,
      |        string_agg(event_type || ':' || n, ' ' ORDER BY rn) AS top_types
      |      FROM r WHERE rn <= 3 GROUP BY 1),
      |tot AS (SELECT win_start, COUNT(*) AS n FROM w GROUP BY 1)
      |SELECT t.win_start, t.top_types, tot.n
      |FROM t JOIN tot USING (win_start) ORDER BY win_start""".stripMargin

  /** User journey mining — the top 3-step event paths across the user
    * base (the product-analytics "common flows" report; [[transitions]]
    * is its 2-step marginal): lead(1)/lead(2) over each user's
    * time-ordered stream build the trigram in place — no collect, no
    * self-join — then one path-keyed count and a top-20 heads. The
    * user window and everything after share one hash(user_id) + one
    * hash(path) exchange; paths are bounded (|event_types|³).
    */
  def topPaths(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    Tables.t(s, dir, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("e2", lead($"event_type", 1).over(w))
      .withColumn("e3", lead($"event_type", 2).over(w))
      .filter($"e2".isNotNull && $"e3".isNotNull)
      .select(concat_ws(">", $"event_type", $"e2", $"e3").as("path"))
      .groupBy($"path").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"path".asc)
      .limit(20)
  }

  private val topPathsSql =
    """WITH p AS (
      |  SELECT event_type,
      |    lead(event_type, 1) OVER w AS e2,
      |    lead(event_type, 2) OVER w AS e3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT event_type || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
      |FROM p WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin

  /** Daily new / cumulative user counts — the growth-accounting curve
    * every events pipeline reports: each user's first-seen day, a
    * day-keyed rollup to new-user counts, and a running sum. The scan
    * collapses to one row per user map-side (min-day partial agg), the
    * day table is bounded (~date range), and the single running-sum
    * window over it is a bounded SinglePartition by construction — the
    * [[graft.ops.SqlSurface.profile]] convention: global windows are
    * banned over row data, fine over a ≤10³-row aggregate.
    */
  def cumulativeUsers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val firstDay = Tables.t(s, dir, "events")
      .select($"user_id", expr("CAST(ts AS LONG) div 86400").as("day"))
      .groupBy($"user_id").agg(min($"day").as("first_day"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"first_day".asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    firstDay.groupBy($"first_day").agg(count(lit(1)).as("new_users"))
      .withColumn("cum_users", sum($"new_users").over(w))
      .orderBy($"first_day")
  }

  private val cumulativeUsersSql =
    """WITH f AS (
      |  SELECT user_id,
      |    MIN(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS first_day
      |  FROM events GROUP BY 1),
      |d AS (SELECT first_day, COUNT(*) AS new_users FROM f GROUP BY 1)
      |SELECT first_day, new_users,
      |  CAST(SUM(new_users) OVER (ORDER BY first_day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
      |FROM d ORDER BY first_day""".stripMargin

  /** Per-entity EWMA smoothing — the monitoring/anomaly primitive a
    * windowed mean can't express: s_1 = v_1, s_t = (7·s_{t−1} + v_t)
    * div 8 (α = 1/8 as a pure integer recurrence on value cents, so
    * the whole series is engine-exact — no float accumulates across
    * the fold). A RECURSIVE per-row dependency like this has no
    * window-function form; the distributed-sane shape is ONE
    * (user_id) exchange collecting each entity's time-ordered history
    * into an array, then the fold as a codegen `aggregate` HOF over
    * that array — the q_evt_paths boundedness argument: per-entity
    * event history is bounded (86 events/user at gate scale), and a
    * corpus where it isn't should run the streaming stateful form
    * (flatMapGroupsWithState) instead of batch-collecting. The oracle
    * recomputes the recurrence INDEPENDENTLY as a DuckDB recursive CTE
    * stepping rn → rn+1 — per-row recursion vs array fold, the
    * q_dedup_cc two-formulations discipline. Values are non-negative
    * in this table, and both Spark's `div` and DuckDB's `//` truncate
    * toward zero (measured), so the recurrences agree exactly; the
    * cents cast floors an identical IEEE product on both sides.
    */
  def ewma(s: SparkSession, dir: String): DataFrame =
    ewmaOf(Tables.t(s, dir, "events"))

  /** Core of [[ewma]] over any (user_id, ts, event_id, value) table —
    * separated so the recurrence is pinned against a THIRD (JVM fold)
    * implementation on randomized sequences (InvariantSpec), not just
    * the fixture gate.
    *
    * `maxHistory` makes the batch form's boundedness assumption a
    * RUNTIME contract, not scaladoc advice (r12 verdict #3): the
    * collect_list holds one entity's full history in one task, so a
    * power-law entity at corpus scale would OOM silently — instead,
    * any entity past the cap fails the job loudly (a codegen'd
    * raise_error inside the fold input, zero extra passes) with a
    * message naming the entity and directing it to [[graft.streaming
    * .StreamOps.statefulEwma]], the constant-state streaming twin.
    * The default (100k events ≈ a few MB of struct array per task) is
    * far above any sane batch entity and far below task-OOM territory
    * — the stride-guard / maxRounds / admission-control discipline.
    */
  private[ops] def ewmaOf(events: DataFrame,
      maxHistory: Int = 100000): DataFrame = {
    require(maxHistory > 0, s"maxHistory must be positive: $maxHistory")
    val s = events.sparkSession
    import s.implicits._
    events
      .select($"user_id",
        struct($"ts", $"event_id",
          floor($"value" * 100).cast("long").as("v")).as("e"))
      .groupBy($"user_id")
      .agg(sort_array(collect_list($"e")).as("es"))
      // CASE branches coerce (raise_error is NullType), so the guard
      // lives INSIDE the data path — the optimizer can never prune it
      .withColumn("es", expr(
        s"""CASE WHEN size(es) <= $maxHistory THEN es
           |ELSE raise_error(concat('ewmaOf: entity ', user_id, ' has ',
           |  size(es), ' events, past maxHistory=$maxHistory — batch EWMA',
           |  ' collects one entity''s history into one task; raise the cap',
           |  ' only with the memory math, or use statefulEwma (streaming,',
           |  ' constant state) for unbounded entities')) END""".stripMargin))
      .withColumn("svals", expr(
        """aggregate(es, cast(array() as array<bigint>),
          |  (acc, x) -> array_append(acc,
          |    CASE WHEN size(acc) = 0 THEN x.v
          |         ELSE (7 * element_at(acc, -1) + x.v) div 8 END))""".stripMargin))
      .select($"user_id", posexplode(arrays_zip($"es", $"svals")))
      .select($"user_id", ($"pos" + 1).cast("long").as("rn"),
        $"col.es.event_id".as("event_id"), $"col.es.v".as("v"),
        $"col.svals".as("ewma"))
      .orderBy($"user_id", $"rn")
  }

  private val ewmaSql =
    """WITH RECURSIVE s AS (
      |  SELECT user_id, event_id,
      |    CAST(floor(value * 100) AS BIGINT) AS v,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS BIGINT) AS rn
      |  FROM events),
      |r AS (
      |  SELECT user_id, rn, event_id, v, v AS ewma FROM s WHERE rn = 1
      |  UNION ALL
      |  SELECT s.user_id, s.rn, s.event_id, s.v, (7 * r.ewma + s.v) // 8
      |  FROM r JOIN s ON s.user_id = r.user_id AND s.rn = r.rn + 1)
      |SELECT user_id, rn, event_id, v, ewma FROM r
      |ORDER BY user_id, rn""".stripMargin

  /** Per-type linear trend — the "is this metric drifting" primitive
    * next to [[hourlySpikes]] (level jumps) and [[ewma]] (smoothing):
    * an exact least-squares slope over each event type's DAILY series,
    * for both volume (events/day) and value mass (cents/day). The
    * closed form is slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) — every
    * term an int64 SUM over integers (x = days since a fixed anchor,
    * y = count / cents), so the whole fit is engine-exact with ONE
    * integer division at the end (reported in permille; no float ever
    * accumulates — the integer-bridge discipline applied to
    * regression). Overflow headroom: x ≲ 2·10³, so n·Σxy stays under
    * 10¹⁵ even at 10⁹ events/day·type.
    *
    * Shuffle shape: one (type, day) rollup — the only exchange that
    * sees event volume, map-side combinable — then a |types×days|-row
    * second rollup and the closed form as a projection. No window, no
    * sort, no per-type iteration; at 100 TB the daily table is
    * metadata-sized and the fit is free.
    */
  def trend(s: SparkSession, dir: String): DataFrame =
    trendOf(Tables.t(s, dir, "events"))

  /** Core of [[trend]] over any (event_type, ts, value) table —
    * separated so planted exact lines (slope known by construction),
    * declining slopes, and the single-day NULL guard are
    * unit-testable (InvariantSpec). */
  private[ops] def trendOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val anchor = lit("2020-01-01").cast("date")
    events
      .groupBy($"event_type",
        datediff($"ts".cast("date"), anchor).cast("long").as("x"))
      .agg(count(lit(1)).as("yn"),
        sum(floor($"value" * 100).cast("long")).as("yc"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        sum($"x").as("sx"), sum($"x" * $"x").as("sxx"),
        sum($"yn").as("syn"), sum($"x" * $"yn").as("sxyn"),
        sum($"yc").as("syc"), sum($"x" * $"yc").as("sxyc"))
      .withColumn("den", expr("n_days * sxx - sx * sx"))
      // Spark's `div` and DuckDB's `//` BOTH truncate toward zero
      // (measured: -7 // 8 = 0 in DuckDB 1.0), so a negative slope
      // divides identically on both sides with no floor adjustment.
      // den = n·Σx² − (Σx)² ≥ 0, and = 0 iff the type has ONE day of
      // data — no slope exists; NULL, not a crash (ANSI div-by-zero)
      .select($"event_type", $"n_days", $"syn".as("n_events"),
        $"syc".as("total_cents"),
        expr("""CASE WHEN den = 0 THEN NULL
                ELSE (1000 * (n_days * sxyn - sx * syn)) div den
                END""").as("slope_count_permille"),
        expr("""CASE WHEN den = 0 THEN NULL
                ELSE (1000 * (n_days * sxyc - sx * syc)) div den
                END""").as("slope_cents_permille"))
      .orderBy($"event_type")
  }

  private val trendSql =
    """WITH d AS (
      |  SELECT event_type,
      |    CAST(date_diff('day', DATE '2020-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
      |    CAST(COUNT(*) AS BIGINT) AS yn,
      |    CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS yc
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    CAST(SUM(yn) AS BIGINT) AS syn, CAST(SUM(x * yn) AS BIGINT) AS sxyn,
      |    CAST(SUM(yc) AS BIGINT) AS syc, CAST(SUM(x * yc) AS BIGINT) AS sxyc
      |  FROM d GROUP BY 1)
      |SELECT event_type, n_days, syn AS n_events, syc AS total_cents,
      |  CASE WHEN n_days * sxx - sx * sx = 0 THEN NULL
      |       ELSE 1000 * (n_days * sxyn - sx * syn) // (n_days * sxx - sx * sx)
      |  END AS slope_count_permille,
      |  CASE WHEN n_days * sxx - sx * sx = 0 THEN NULL
      |       ELSE 1000 * (n_days * sxyc - sx * syc) // (n_days * sxx - sx * sx)
      |  END AS slope_cents_permille
      |FROM m ORDER BY event_type""".stripMargin

  def entries: Seq[CatalogEntry] = Seq(
    CatalogEntry("q_evt_ewma", ewma, Some(ewmaSql)),
    CatalogEntry("q_evt_trend", trend, Some(trendSql)),
    CatalogEntry("q_evt_paths", topPaths, Some(topPathsSql)),
    CatalogEntry("q_evt_cumulative_users", cumulativeUsers, Some(cumulativeUsersSql)),
    CatalogEntry("q_evt_top_types", topTypesHourly, Some(topTypesHourlySql)),
    CatalogEntry("q_evt_rfm", rfm, Some(rfmSql)),
    CatalogEntry("q_evt_spikes", hourlySpikes, Some(hourlySpikesSql)),
    CatalogEntry("q_evt_wau", rollingActive, Some(rollingActiveSql)),
    CatalogEntry("q_evt_transitions", transitions, Some(transitionsSql)),
    CatalogEntry("q_evt_retention", retention, Some(retentionSql)),
    CatalogEntry("q_evt_attribution", attribution, Some(attributionSql)),
    CatalogEntry("q_evt_attribution_capped", attributionCapped, Some(attributionCappedSql)),
    CatalogEntry("q_evt_funnel", funnel, Some(funnelSql)),
    CatalogEntry("q_evt_tumbling", tumbling, Some(tumblingSql)),
    CatalogEntry("q_evt_sliding", sliding, Some(slidingSql)),
    CatalogEntry("q_evt_session", sessionize, Some(sessionizeSql)),
    CatalogEntry("q_evt_dedup", eventDedup, Some(eventDedupSql)),
    CatalogEntry("q_evt_stream_static", streamStaticJoin, Some(streamStaticJoinSql)))
}
