package graft.ops

import graft.{CatalogEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators (SURVEY.md §2.B "Window functions").
  * Each window partitions by a key (one shuffle) and sorts within the
  * partition — at 100 TB the partition key must be high-cardinality
  * (customer, order), never a constant, or one executor sorts the world.
  * All orderings carry explicit tiebreakers so ranks are deterministic.
  */
object Windows {

  /** Ranking family: row_number / rank / dense_rank / ntile /
    * percent_rank per market segment.
    */
  def ranking(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal".desc, $"c_custkey".asc)
    Tables.t(s, dir, "customer")
      .select(
        $"c_mktsegment", $"c_custkey", $"c_acctbal",
        row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rk"),
        dense_rank().over(w).cast("long").as("drk"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("prk"))
      .filter($"rn" <= 50)
      .orderBy($"c_mktsegment", $"rn")
  }

  private val rankingSql =
    """SELECT * FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    row_number() OVER w AS rn, rank() OVER w AS rk,
      |    dense_rank() OVER w AS drk, ntile(4) OVER w AS quartile,
      |    percent_rank() OVER w AS prk
      |  FROM customer
      |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
      |) t WHERE rn <= 50 ORDER BY c_mktsegment, rn""".stripMargin

  /** Analytic family: lag / lead / first_value / last_value over each
    * customer's order history.
    */
  def analytic(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.t(s, dir, "orders")
      .filter($"o_custkey" < 100)
      .select(
        $"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice",
        lag($"o_totalprice", 1).over(w).as("prev_price"),
        lead($"o_totalprice", 1).over(w).as("next_price"),
        first($"o_totalprice").over(wf).as("first_price"),
        last($"o_totalprice").over(wf).as("last_price"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  private val analyticSql =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  lag(o_totalprice, 1) OVER w AS prev_price,
      |  lead(o_totalprice, 1) OVER w AS next_price,
      |  first_value(o_totalprice) OVER wf AS first_price,
      |  last_value(o_totalprice) OVER wf AS last_price
      |FROM orders WHERE o_custkey < 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
      |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Aggregates over frames: running total (ROWS UNBOUNDED..CURRENT) and
    * centered moving average (ROWS 2 PRECEDING..2 FOLLOWING). Frame sums
    * over doubles go through the integer bridge — window frame summation
    * order differs between engines (segment trees vs running state).
    */
  def frames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mov = w.rowsBetween(-2, 2)
    val scaled = round($"o_totalprice" * 10000.0).cast("long")
    Tables.t(s, dir, "orders")
      .filter($"o_custkey" < 100)
      .select(
        $"o_custkey", $"o_orderkey", $"o_orderdate",
        (sum(scaled).over(run).cast("double") / 10000.0).as("running_total"),
        (sum(scaled).over(mov).cast("double") / 10000.0 /
          count(lit(1)).over(mov)).as("moving_avg5"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  private val framesSql =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(CAST(SUM(CAST(round(o_totalprice * 10000.0) AS BIGINT)) OVER run AS BIGINT) AS DOUBLE) / 10000.0
      |    AS running_total,
      |  CAST(CAST(SUM(CAST(round(o_totalprice * 10000.0) AS BIGINT)) OVER mov AS BIGINT) AS DOUBLE) / 10000.0
      |    / COUNT(*) OVER mov AS moving_avg5
      |FROM orders WHERE o_custkey < 100
      |WINDOW run AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  mov AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |          ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** RANGE frame: per returnflag, count of lineitems shipped within the
    * trailing 30 days of each row's shipdate (range frame over an
    * interval). Restricted to one order's items to keep output small.
    */
  def rangeFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"l_returnflag")
      .orderBy(unix_timestamp($"l_shipdate"))
      .rangeBetween(-30L * 86400, 0)
    Tables.t(s, dir, "lineitem")
      .filter($"l_orderkey" < 500)
      .select(
        $"l_orderkey", $"l_linenumber", $"l_returnflag", $"l_shipdate",
        count(lit(1)).over(w).as("n_trailing_30d"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  private val rangeFrameSql =
    """SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate,
      |  COUNT(*) OVER (PARTITION BY l_returnflag ORDER BY epoch(l_shipdate)
      |                 RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS n_trailing_30d
      |FROM lineitem WHERE l_orderkey < 500
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Top-N per group: 3 most expensive orders per customer segment. */
  def topNPerGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.t(s, dir, "customer").select($"c_custkey", $"c_mktsegment")
    val o = Tables.t(s, dir, "orders")
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 3)
      .select($"c_mktsegment", $"rn", $"o_orderkey", $"o_totalprice")
      .orderBy($"c_mktsegment", $"rn")
  }

  private val topNPerGroupSql =
    """SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders JOIN customer ON o_custkey = c_custkey) t
      |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin

  /** IGNORE NULLS analytics: per customer order sequence, carry forward
    * the most recent BIG order total (nulls elsewhere) — the
    * last-observation-carried-forward shape time-series fills use.
    * Exact doubles (values pass through untouched), total ORDER BY.
    */
  def ignoreNulls(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.t(s, dir, "orders")
      .withColumn("big",
        when($"o_totalprice" > 300000.0, $"o_totalprice"))
      .select($"o_custkey", $"o_orderkey", $"o_orderdate",
        last($"big", ignoreNulls = true).over(w).as("prev_big"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  private val ignoreNullsSql =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  last_value(CASE WHEN o_totalprice > 300000.0 THEN o_totalprice END IGNORE NULLS)
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_big
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Linear gap interpolation — the time-series repair step between
    * forward-fill ([[ignoreNulls]]) and a model: values are OBSERVED
    * only at purchase events; every other event in a user's sequence
    * gets the straight line between its neighboring observations,
    * leading/trailing gaps fall back to nearest-observation fill. All
    * integer: cents on the 1e2 grid, and the interpolation is the
    * WEIGHTED-SUM form `(prev·(np−p) + next·(p−pp)) div (np−pp)` whose
    * numerator is a sum of non-negative products (values ≥ 0, position
    * gaps > 0) — so Spark's truncating `div` and DuckDB's flooring `//`
    * agree, where the naive `prev + Δ·k/gap` form would diverge on
    * falling segments. Two window passes over one user-keyed sort
    * (backward-looking last + forward-looking first, both IGNORE
    * NULLS); the only exchange is hash(user_id).
    */
  def interpolate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val back = w.rowsBetween(Window.unboundedPreceding, 0)
    val fwd = w.rowsBetween(0, Window.unboundedFollowing)
    Tables.t(s, dir, "events")
      .filter($"user_id" < 50)
      .select($"user_id", $"event_id", $"ts",
        when($"event_type" === "purchase",
          round($"value" * 100).cast("long")).as("obs"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("prev_c", last($"obs", ignoreNulls = true).over(back))
      .withColumn("prev_p", last(when($"obs".isNotNull, $"pos"), ignoreNulls = true).over(back))
      .withColumn("next_c", first($"obs", ignoreNulls = true).over(fwd))
      .withColumn("next_p", first(when($"obs".isNotNull, $"pos"), ignoreNulls = true).over(fwd))
      .select($"user_id", $"pos", $"event_id", $"obs",
        when($"obs".isNotNull, $"obs")
          .when($"prev_c".isNotNull && $"next_c".isNotNull, expr(
            "(prev_c * (next_p - pos) + next_c * (pos - prev_p)) div (next_p - prev_p)"))
          .otherwise(coalesce($"prev_c", $"next_c")).as("cents_filled"))
      .orderBy($"user_id", $"pos")
  }

  private val interpolateSql =
    """WITH e AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN event_type = 'purchase'
      |         THEN CAST(round(value * 100) AS BIGINT) END AS obs
      |  FROM events WHERE user_id < 50),
      |p AS (
      |  SELECT user_id, event_id, obs,
      |    CAST(row_number() OVER w AS BIGINT) AS pos,
      |    last_value(obs IGNORE NULLS)
      |      OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_c,
      |    first_value(obs IGNORE NULLS)
      |      OVER (w ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_c
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |q AS (
      |  SELECT user_id, event_id, obs, pos, prev_c, next_c,
      |    last_value(CASE WHEN obs IS NOT NULL THEN pos END IGNORE NULLS)
      |      OVER (w2 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_p,
      |    first_value(CASE WHEN obs IS NOT NULL THEN pos END IGNORE NULLS)
      |      OVER (w2 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_p
      |  FROM p
      |  WINDOW w2 AS (PARTITION BY user_id ORDER BY pos))
      |SELECT user_id, pos, event_id, obs,
      |  CASE WHEN obs IS NOT NULL THEN obs
      |       WHEN prev_c IS NOT NULL AND next_c IS NOT NULL
      |         THEN (prev_c * (next_p - pos) + next_c * (pos - prev_p)) // (next_p - prev_p)
      |       ELSE coalesce(prev_c, next_c) END AS cents_filled
      |FROM q ORDER BY user_id, pos""".stripMargin

  def entries: Seq[CatalogEntry] = Seq(
    CatalogEntry("q_win_interpolate", interpolate, Some(interpolateSql)),
    CatalogEntry("q_win_ignore_nulls", ignoreNulls, Some(ignoreNullsSql)),
    CatalogEntry("q_win_rank", ranking, Some(rankingSql)),
    CatalogEntry("q_win_analytic", analytic, Some(analyticSql)),
    CatalogEntry("q_win_frames", frames, Some(framesSql)),
    CatalogEntry("q_win_range_frame", rangeFrame, Some(rangeFrameSql)),
    CatalogEntry("q_win_topn", topNPerGroup, Some(topNPerGroupSql)))
}
