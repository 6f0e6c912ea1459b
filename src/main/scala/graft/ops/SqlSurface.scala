package graft.ops

import graft.{CatalogEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL-surface operators the reference reaches only through its raw
  * passthrough query box (SURVEY.md §2.B): CTEs, correlated subqueries
  * (decorrelated by Catalyst to semi-joins / scalar aggregates), and
  * PIVOT. These run via spark.sql over registered views — the same
  * entry point the rebuilt "sql" transform step uses.
  */
object SqlSurface {

  private def view(s: SparkSession, dir: String, name: String): Unit =
    Tables.t(s, dir, name).createOrReplaceTempView(name)

  /** WITH / CTE chain. */
  def cte(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "orders"); view(s, dir, "customer")
    s.sql(
      s"""WITH big AS (
         |  SELECT o_custkey, COUNT(*) AS n_big, ${dsumSql("o_totalprice")} AS total
         |  FROM orders WHERE o_totalprice > 200000.0 GROUP BY o_custkey),
         |ranked AS (
         |  SELECT b.*, c_mktsegment FROM big b JOIN customer ON o_custkey = c_custkey)
         |SELECT c_mktsegment, COUNT(*) AS n_cust,
         |  ${dsumSql("total")} AS seg_total
         |FROM ranked GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  private val cteSql =
    s"""WITH big AS (
       |  SELECT o_custkey, COUNT(*) AS n_big, ${dsumSql("o_totalprice")} AS total
       |  FROM orders WHERE o_totalprice > 200000.0 GROUP BY o_custkey),
       |ranked AS (
       |  SELECT b.*, c_mktsegment FROM big b JOIN customer ON o_custkey = c_custkey)
       |SELECT c_mktsegment, COUNT(*) AS n_cust,
       |  ${dsumSql("total")} AS seg_total
       |FROM ranked GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** WITH RECURSIVE (Spark 4.x UnionLoop): a decimal-forest walk over
    * `documents` — parent(d) = d div 10, roots = doc_id < 10 — depth
    * per node via the anchor ∪ recursive-step fixpoint, rolled up per
    * depth. The recursion terminates structurally (each step moves one
    * decimal digit, so depth ≤ ⌈log₁₀ max_id⌉); Spark plans it as an
    * iterated union with the per-step child join, DuckDB as its own
    * recursive CTE — agreeing exactly because the arithmetic is
    * integer division on non-negative ids. The depth rollup keeps the
    * gate row small at any scale factor.
    */
  def recursiveCte(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "documents")
    s.sql(
      """WITH RECURSIVE r(doc_id, depth) AS (
        |  SELECT doc_id, 0 FROM documents WHERE doc_id < 10
        |  UNION ALL
        |  SELECT c.doc_id, r.depth + 1
        |  FROM documents c JOIN r ON c.doc_id div 10 = r.doc_id
        |  WHERE c.doc_id >= 10)
        |SELECT depth, COUNT(*) AS n_docs,
        |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
        |  CAST(SUM(doc_id) AS BIGINT) AS sum_doc
        |FROM r GROUP BY depth ORDER BY depth""".stripMargin)
  }

  private val recursiveCteSql =
    """WITH RECURSIVE r(doc_id, depth) AS (
      |  SELECT doc_id, 0 FROM documents WHERE doc_id < 10
      |  UNION ALL
      |  SELECT c.doc_id, r.depth + 1
      |  FROM documents c JOIN r ON c.doc_id // 10 = r.doc_id
      |  WHERE c.doc_id >= 10)
      |SELECT depth, COUNT(*) AS n_docs,
      |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
      |  CAST(SUM(doc_id) AS BIGINT) AS sum_doc
      |FROM r GROUP BY depth ORDER BY depth""".stripMargin

  /** Correlated EXISTS + uncorrelated IN subqueries (Catalyst
    * decorrelates to semi-joins).
    */
  def subqueryIn(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "orders"); view(s, dir, "customer"); view(s, dir, "nation")
    s.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9500.0)
        |  AND EXISTS (SELECT 1 FROM customer c JOIN nation n ON c_nationkey = n_nationkey
        |              WHERE c.c_custkey = o.o_custkey AND n.n_name = 'NATION_7')
        |ORDER BY o_orderkey""".stripMargin)
  }

  private val subqueryInSql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9500.0)
      |  AND EXISTS (SELECT 1 FROM customer c JOIN nation n ON c_nationkey = n_nationkey
      |              WHERE c.c_custkey = o.o_custkey AND n.n_name = 'NATION_7')
      |ORDER BY o_orderkey""".stripMargin

  /** Scalar subquery: each order against the global bridged average. */
  def subqueryScalar(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "orders")
    s.sql(
      s"""SELECT o_orderkey, o_totalprice,
         |  o_totalprice / (SELECT ${dsumSql("o_totalprice")} / COUNT(*) FROM orders)
         |    AS vs_avg
         |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin)
  }

  private val subqueryScalarSql =
    s"""SELECT o_orderkey, o_totalprice,
       |  o_totalprice / (SELECT ${dsumSql("o_totalprice")} / COUNT(*) FROM orders)
       |    AS vs_avg
       |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin

  private val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  /** PIVOT with an explicit value list (deterministic column set —
    * never let pivot infer values from data at scale: that's an extra
    * distinct-scan and a nondeterministic schema).
    */
  def pivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "customer")
      .groupBy($"c_nationkey")
      .pivot("c_mktsegment", segments)
      .agg(count(lit(1)))
      .na.fill(0L, segments)
      .orderBy($"c_nationkey")
  }

  private val pivotSql = {
    val cols = segments.map(seg =>
      s"""COUNT(CASE WHEN c_mktsegment = '$seg' THEN 1 END) AS "$seg"""").mkString(",\n  ")
    s"""SELECT c_nationkey,
       |  $cols
       |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
  }

  /** The reference's sanitize semantics (A6, SURVEY.md §1.3) as an
    * oracle-checked operator: nulls manufactured with nullif, then
    * NaT→1900-01-01, timestamp→second-truncation, null-string→"".
    */
  def sanitizeOp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val withNulls = Tables.t(s, dir, "orders")
      .filter($"o_orderkey" < 2000)
      .select(
        $"o_orderkey",
        nullif($"o_orderstatus", lit("O")).as("status_n"),
        when($"o_custkey" % 7 === 0, lit(null).cast("timestamp"))
          .otherwise($"o_orderdate").as("date_n"))
    graft.exec.Sanitize(withNulls).orderBy($"o_orderkey")
  }

  private val sanitizeOpSql =
    """SELECT o_orderkey,
      |  coalesce(nullif(o_orderstatus, 'O'), '') AS status_n,
      |  date_trunc('second', coalesce(
      |    CASE WHEN o_custkey % 7 = 0 THEN NULL ELSE o_orderdate END,
      |    TIMESTAMP '1900-01-01 00:00:00')) AS date_n
      |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin

  /** LATERAL correlated subquery — top-2 customers by balance per
    * nation, the per-row dependent-subquery shape (Catalyst decorrelates
    * the lateral LIMIT into a ranked window under the hood; DuckDB runs
    * the same ANSI text verbatim). Distinct from q_sql_subquery_*: the
    * lateral body returns ROWS per outer row, not one scalar.
    */
  def lateral(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "nation"); view(s, dir, "customer")
    s.sql(lateralSql)
  }

  private val lateralSql =
    """SELECT n_name, c.c_custkey, c.c_acctbal
      |FROM nation, LATERAL (
      |  SELECT c_custkey, c_acctbal FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2) c
      |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin

  /** Date-spine gap filling — the time-series reporting pattern: a
    * generated day spine (sequence + explode, a row GENERATOR not a
    * table scan) left-joined to per-day order counts so days with no
    * orders appear as explicit zeros. Deterministic ints; the oracle
    * builds the same spine with generate_series.
    */
  def dateSpine(s: SparkSession, dir: String): DataFrame = {
    view(s, dir, "orders")
    s.sql(
      """WITH spine AS (
        |  SELECT explode(sequence(DATE'1995-01-01', DATE'1995-03-31',
        |                          INTERVAL 1 DAY)) AS day),
        |daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
        |  FROM orders GROUP BY 1)
        |SELECT s.day, coalesce(d.n, 0) AS n_orders
        |FROM spine s LEFT JOIN daily d ON s.day = d.day
        |ORDER BY s.day""".stripMargin)
  }

  private val dateSpineSql =
    """WITH spine AS (
      |  SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1995-03-31',
      |                                     INTERVAL 1 DAY)) AS DATE) AS day),
      |daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n
      |  FROM orders GROUP BY 1)
      |SELECT s.day, coalesce(d.n, 0) AS n_orders
      |FROM spine s LEFT JOIN daily d ON s.day = d.day
      |ORDER BY s.day""".stripMargin

  /** MERGE / upsert — the batch "MERGE INTO target USING source" the
    * reference reaches through its SQL passthrough, expressed in the
    * distributed shape: ONE full-outer equi-join on the key, then a
    * row-wise coalesce picks source over target. Matched keys update,
    * source-only keys insert, target-only keys pass through — the
    * `action` column makes all three branches gate-visible. Source
    * here is derived deterministically from the target itself (keys
    * %100<10 update their balance, %100≥95 spawn new +10M keys), so
    * the query is self-contained on the fixture. Balances ride the
    * integer cents bridge (round(×100)) — no float drift across
    * engines. At 100 TB: two hash exchanges on the merge key and a
    * sort-merge full-outer — the same plan DELETE+INSERT rewrites
    * compile to; nothing driver-side.
    */
  def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = Tables.t(s, dir, "customer")
      .select($"c_custkey", $"c_name",
        round($"c_acctbal" * 100).cast("long").as("cents"))
    val updates = t.filter($"c_custkey" % 100 < 10)
      .select($"c_custkey", lit(null).cast("string").as("s_name"),
        ($"cents" + 5000L).as("s_cents"))
    val inserts = t.filter($"c_custkey" % 100 >= 95)
      .select(($"c_custkey" + 10000000L).as("c_custkey"),
        concat(lit("NEW-"), ($"c_custkey" + 10000000L).cast("string")).as("s_name"),
        lit(0L).as("s_cents"))
    // s_present marks SOURCE-ROW existence after the outer join: the
    // matched/not-matched test must never key off a nullable value
    // column (a null source balance is still an update, and the oracle
    // classifies by join-key presence)
    t.join(updates.union(inserts).withColumn("s_present", lit(true)),
        Seq("c_custkey"), "full_outer")
      .select($"c_custkey",
        coalesce($"s_name", $"c_name").as("c_name"),
        coalesce($"s_cents", $"cents").as("acct_cents"),
        when($"c_name".isNull, "insert")
          .when($"s_present".isNull, "keep")
          .otherwise("update").as("action"))
      .orderBy($"c_custkey")
  }

  /** Oracle: a deliberately DIFFERENT formulation — left join for the
    * update/keep branches plus an anti-join for inserts, unioned. */
  private val mergeUpsertSql =
    """WITH t AS (SELECT c_custkey, c_name,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
      |src AS (
      |  SELECT c_custkey, NULL AS s_name, cents + 5000 AS s_cents
      |  FROM t WHERE c_custkey % 100 < 10
      |  UNION ALL
      |  SELECT c_custkey + 10000000, 'NEW-' || CAST(c_custkey + 10000000 AS VARCHAR), 0
      |  FROM t WHERE c_custkey % 100 >= 95)
      |SELECT t.c_custkey, t.c_name,
      |  coalesce(s.s_cents, t.cents) AS acct_cents,
      |  CASE WHEN s.c_custkey IS NULL THEN 'keep' ELSE 'update' END AS action
      |FROM t LEFT JOIN src s ON t.c_custkey = s.c_custkey
      |UNION ALL
      |SELECT s.c_custkey, s.s_name, s.s_cents, 'insert'
      |FROM src s ANTI JOIN t ON s.c_custkey = t.c_custkey
      |ORDER BY c_custkey""".stripMargin

  /** UNPIVOT / melt — wide→long reshaping (the inverse of [[pivot]]).
    * Spark's `unpivot` compiles to a map-side Expand: one scan, two
    * output rows per input, ZERO shuffles — the 100 TB shape for
    * feature-table melting. Both measures are cast to one long type
    * (id cols stay); retail price rides the cents bridge.
    */
  def unpivotOp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "part")
      .select($"p_partkey", $"p_size".cast("long").as("p_size"),
        round($"p_retailprice" * 100).cast("long").as("retail_cents"))
      .unpivot(Array($"p_partkey"), Array($"p_size", $"retail_cents"),
        "metric", "value")
      .orderBy($"p_partkey", $"metric")
  }

  private val unpivotOpSql =
    """SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS BIGINT) AS value
      |FROM part
      |UNION ALL
      |SELECT p_partkey, 'retail_cents', CAST(round(p_retailprice * 100) AS BIGINT)
      |FROM part
      |ORDER BY p_partkey, metric""".stripMargin

  /** Columns profiled by [[profile]], in output order. */
  private val profileCols = Seq("doc_id", "lang", "n_chars", "source", "text")

  /** Per-column data profiling — the summary every ETL tool's metadata
    * UI shows before a load (the reference introspects schemas for
    * exactly this purpose, `core/extractors/sqlserver.py:117-150`):
    * row/non-null/distinct counts plus min/max per column of the
    * documents table. Values are compared as strings (CAST before
    * MIN/MAX in BOTH engines, so the ordering itself is lexicographic
    * and engine-independent; fixture text is ASCII where binary and
    * collated orders agree). One full scan, all 20 aggregates in a
    * single pass (Spark plans the 5 count-distincts as one Expand —
    * 5× map-side rows, still one scan, no joins), then a map-side
    * `stack` to long form. At 100 TB: this is the one-pass profile
    * you run INSTEAD of 5 per-column queries; the final single-row
    * exchange carries 20 scalars.
    */
  def profile(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.t(s, dir, "documents")
    val aggs = count(lit(1)).as("n_rows") +: profileCols.flatMap(c => Seq(
      count(col(c)).as(s"cnt_$c"),
      countDistinct(col(c)).as(s"dist_$c"),
      min(col(c).cast("string")).as(s"min_$c"),
      max(col(c).cast("string")).as(s"max_$c")))
    val stackArgs = profileCols.map(c =>
      s"'$c', cnt_$c, dist_$c, min_$c, max_$c").mkString(", ")
    d.agg(aggs.head, aggs.tail: _*)
      .selectExpr("n_rows",
        s"stack(${profileCols.size}, $stackArgs) AS (col_name, n_nonnull, n_distinct, min_s, max_s)")
      .select(col("col_name"), col("n_rows"),
        (col("n_rows") - col("n_nonnull")).as("n_nulls"),
        col("n_distinct"), col("min_s"), col("max_s"))
      .orderBy("col_name")
  }

  private val profileSql = profileCols.map(c =>
    s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
       |  COUNT(*) - COUNT($c) AS n_nulls,
       |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
       |  MIN(CAST($c AS VARCHAR)) AS min_s, MAX(CAST($c AS VARCHAR)) AS max_s
       |FROM documents""".stripMargin)
    .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")

  /** Data-quality expectations over the fixture suite — see
    * [[graft.connect.Validation]] (the reference's declared-but-empty
    * validation_service surface). Same-table rules fuse into one scan;
    * the ruleset deliberately mixes passing and violated rules so the
    * gate checks real counts.
    */
  def expectations(s: SparkSession, dir: String): DataFrame =
    graft.connect.Validation.run(s, dir, graft.connect.Validation.fixtureRules)

  private val expectationsSql =
    """WITH u AS (
      |  SELECT 'accepted:lineitem.l_returnflag{A,N}' AS rule,
      |    (SELECT COUNT(*) FROM lineitem WHERE l_returnflag NOT IN ('A','N')) AS violations
      |  UNION ALL
      |  SELECT 'fk:lineitem.l_orderkey->orders.o_orderkey',
      |    (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NOT NULL
      |       AND l_orderkey NOT IN (SELECT o_orderkey FROM orders))
      |  UNION ALL
      |  SELECT 'not_null:documents.text',
      |    (SELECT COUNT(*) FROM documents WHERE text IS NULL)
      |  UNION ALL
      |  SELECT 'not_null:lineitem.l_orderkey',
      |    (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL)
      |  UNION ALL
      |  SELECT 'range:lineitem.l_quantity[1.0,25.0]',
      |    (SELECT COUNT(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 25)
      |  UNION ALL
      |  SELECT 'unique:lineitem.l_orderkey',
      |    (SELECT COUNT(l_orderkey) - COUNT(DISTINCT l_orderkey) FROM lineitem)
      |  UNION ALL
      |  SELECT 'unique:orders.o_orderkey',
      |    (SELECT COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) FROM orders))
      |SELECT rule, CAST(violations AS BIGINT) AS violations,
      |  violations = 0 AS pass
      |FROM u ORDER BY rule""".stripMargin

  /** Snapshot data diff over deterministically derived "yesterday/
    * today" views of orders: snapshot A = keys with `% 3 != 0`, price
    * bumped one cent where `% 5 == 0`; snapshot B = keys with
    * `% 7 != 0` unmodified — so the diff has real added (`%3==0 ∧
    * %7!=0`), removed (`%7==0 ∧ %3!=0`), changed (both present,
    * `%5==0`), and unchanged populations. Comparison is on the cents
    * grid + order status; see [[graft.connect.Validation.dataDiff]]
    * for the operator (full-outer on the key, null-safe column
    * compare, bounded per-status rollup).
    */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val base = Tables.t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val snapA = base.filter(col("o_orderkey") % 3 =!= 0)
      .withColumn("cents",
        when(col("o_orderkey") % 5 === 0, col("cents") + 1).otherwise(col("cents")))
    val snapB = base.filter(col("o_orderkey") % 7 =!= 0)
    graft.connect.Validation.dataDiff(
      snapA, snapB, "o_orderkey", Seq("o_orderstatus", "cents"))
  }

  private val snapshotDiffSql =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderstatus,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |a AS (SELECT o_orderkey, o_orderstatus,
      |        CASE WHEN o_orderkey % 5 = 0 THEN cents + 1 ELSE cents END AS cents
      |      FROM base WHERE o_orderkey % 3 <> 0),
      |b AS (SELECT * FROM base WHERE o_orderkey % 7 <> 0),
      |d AS (
      |  SELECT CASE WHEN a.o_orderkey IS NULL THEN 'added'
      |              WHEN b.o_orderkey IS NULL THEN 'removed'
      |              WHEN a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
      |                OR a.cents IS DISTINCT FROM b.cents THEN 'changed'
      |              ELSE 'unchanged' END AS status,
      |    coalesce(a.o_orderkey, b.o_orderkey) AS key
      |  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
      |SELECT status, COUNT(*) AS n, min(key) AS min_key, max(key) AS max_key
      |FROM d GROUP BY 1 ORDER BY status""".stripMargin

  /** Gaps-and-islands interval merge — the classic SQL-surface pattern
    * (merge overlapping validity/shipping windows, count coverage):
    * per supplier, [shipdate, receiptdate] intervals sorted by
    * (start, end, key), a new island starts where the interval's start
    * exceeds the running max end of everything before it; islands roll
    * up to coverage days. Two stacked windows + two rollups share ONE
    * hash(supplier) exchange — the stacked-window funnel shape. Dates
    * subtract to exact integer days in both engines. Adjacent
    * (start = prev end) intervals merge: a touching handoff is
    * continuous coverage.
    */
  def intervalIslands(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_suppkey"))
      .orderBy(col("istart"), col("iend"), col("l_orderkey"), col("l_linenumber"))
    val prevMax = max(col("iend"))
      .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    Tables.t(s, dir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").cast("date").as("istart"),
        // the fixture carries only the ship date; transit time derives
        // deterministically from the (integral) quantity so both
        // engines build identical [start, end] windows
        date_add(col("l_shipdate").cast("date"),
          col("l_quantity").cast("int") % 14 + 1).as("iend"))
      .withColumn("new_island",
        when(prevMax.isNull || col("istart") > prevMax, 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island"))
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("l_suppkey"), col("island"))
      .agg(count(lit(1)).as("n_intervals"),
        min(col("istart")).as("s"), max(col("iend")).as("e"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("n_intervals")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(datediff(col("e"), col("s")) + 1).cast("long").as("covered_days"))
      .orderBy(col("l_suppkey"))
  }

  private val intervalIslandsSql =
    """WITH base AS (
      |  SELECT l_suppkey, l_orderkey, l_linenumber,
      |    CAST(l_shipdate AS DATE) AS istart,
      |    CAST(l_shipdate AS DATE) + (CAST(l_quantity AS INTEGER) % 14 + 1) AS iend
      |  FROM lineitem),
      |f AS (
      |  SELECT l_suppkey, l_orderkey, l_linenumber, istart, iend,
      |    CASE WHEN max(iend) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
      |                              AND 1 PRECEDING) IS NULL
      |           OR istart > max(iend)
      |                OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |         THEN 1 ELSE 0 END AS new_island
      |  FROM base
      |  WINDOW w AS (PARTITION BY l_suppkey
      |               ORDER BY istart, iend, l_orderkey, l_linenumber)),
      |g AS (
      |  SELECT l_suppkey, istart, iend,
      |    SUM(new_island) OVER (PARTITION BY l_suppkey
      |      ORDER BY istart, iend, l_orderkey, l_linenumber
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM f),
      |i AS (
      |  SELECT l_suppkey, island, COUNT(*) AS n_intervals,
      |    min(istart) AS s, max(iend) AS e
      |  FROM g GROUP BY 1, 2)
      |SELECT l_suppkey, CAST(SUM(n_intervals) AS BIGINT) AS n_intervals,
      |  COUNT(*) AS n_islands,
      |  CAST(SUM(e - s + 1) AS BIGINT) AS covered_days
      |FROM i GROUP BY 1 ORDER BY l_suppkey""".stripMargin

  /** One-pass pairwise correlation matrix — the numeric-profiling
    * sibling of [[profile]]: Pearson correlation for every pair of
    * four lineitem measures from a SINGLE scan's exact integer moment
    * sums (Σx, Σx², Σxy per pair on per-column integer grids sized so
    * every sum fits int64 at fixture scales — the dsum capacity
    * discipline; at 10¹²-row scale the grids shard per partition
    * first). The final Pearson formula runs a fixed shape of IEEE
    * ops (divide, sqrt, multiply) on doubles converted from IDENTICAL
    * exact longs in both engines, then lands on the 1e6 grid — the
    * [[graft.ops.Aggregates.percentileAgg]] convention: floats may
    * compute, only grid integers meet the gate hash. Engine's own
    * `corr()` is deliberately NOT used: its streaming/pairwise update
    * order differs per engine, exactly the nondeterminism the moment
    * bridge exists to avoid.
    */
  def corrMatrix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // integer grids: qty units (≤50), price dollars (≤1e5), disc/tax
    // mills (≤1e3) — every Σx² stays far under int64 at sf ≤ 10
    val cols = Seq(
      "qty" -> round(col("l_quantity")).cast("long"),
      "price" -> round(col("l_extendedprice")).cast("long"),
      "disc" -> round(col("l_discount") * 1000).cast("long"),
      "tax" -> round(col("l_tax") * 1000).cast("long"))
    val base = Tables.t(s, dir, "lineitem")
      .select(cols.map { case (n, c) => c.as(n) }: _*)
    val aggs =
      cols.map { case (n, _) => sum(col(n)).as(s"s_$n") } ++
        cols.map { case (n, _) => sum(col(n) * col(n)).as(s"ss_$n") } ++
        (for {
          (a, i) <- cols.map(_._1).zipWithIndex
          b <- cols.map(_._1).drop(i + 1)
        } yield sum(col(a) * col(b)).as(s"sp_${a}_$b"))
    val m = base.agg(count(lit(1)).as("n"), aggs: _*)
    val pairExprs = (for {
      (a, i) <- cols.map(_._1).zipWithIndex
      b <- cols.map(_._1).drop(i + 1)
    } yield
      s"""'$a', '$b', CAST(round(1e6 *
         |  (CAST(n AS DOUBLE) * CAST(sp_${a}_$b AS DOUBLE)
         |     - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))
         |  / (sqrt(CAST(n AS DOUBLE) * CAST(ss_$a AS DOUBLE)
         |          - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE))
         |     * sqrt(CAST(n AS DOUBLE) * CAST(ss_$b AS DOUBLE)
         |            - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE)))
         |) AS BIGINT)""".stripMargin).mkString(", ")
    m.selectExpr(
      s"stack(6, $pairExprs) AS (col_x, col_y, corr_ppm)")
      .orderBy(col("col_x"), col("col_y"))
  }

  private val corrMatrixSql = {
    val defs = Seq(
      "qty" -> "CAST(round(l_quantity) AS BIGINT)",
      "price" -> "CAST(round(l_extendedprice) AS BIGINT)",
      "disc" -> "CAST(round(l_discount * 1000) AS BIGINT)",
      "tax" -> "CAST(round(l_tax * 1000) AS BIGINT)")
    val moments =
      defs.map { case (n, _) => s"CAST(SUM($n) AS BIGINT) AS s_$n" } ++
        defs.map { case (n, _) => s"CAST(SUM($n * $n) AS BIGINT) AS ss_$n" } ++
        (for {
          (a, i) <- defs.map(_._1).zipWithIndex
          b <- defs.map(_._1).drop(i + 1)
        } yield s"CAST(SUM($a * $b) AS BIGINT) AS sp_${a}_$b")
    val pairs = (for {
      (a, i) <- defs.map(_._1).zipWithIndex
      b <- defs.map(_._1).drop(i + 1)
    } yield
      s"""SELECT '$a' AS col_x, '$b' AS col_y, CAST(round(1e6 *
         |  (CAST(n AS DOUBLE) * CAST(sp_${a}_$b AS DOUBLE)
         |     - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))
         |  / (sqrt(CAST(n AS DOUBLE) * CAST(ss_$a AS DOUBLE)
         |          - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE))
         |     * sqrt(CAST(n AS DOUBLE) * CAST(ss_$b AS DOUBLE)
         |            - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE)))
         |) AS BIGINT) AS corr_ppm FROM m""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH b AS (
       |  SELECT ${defs.map { case (n, d) => s"$d AS $n" }.mkString(", ")}
       |  FROM lineitem),
       |m AS (
       |  SELECT COUNT(*) AS n, ${moments.mkString(", ")}
       |  FROM b)
       |$pairs
       |ORDER BY col_x, col_y""".stripMargin
  }

  def entries: Seq[CatalogEntry] = Seq(
    CatalogEntry("q_sql_corr_matrix", corrMatrix, Some(corrMatrixSql)),
    CatalogEntry("q_sql_intervals", intervalIslands, Some(intervalIslandsSql)),
    CatalogEntry("q_sql_snapshot_diff", snapshotDiff, Some(snapshotDiffSql)),
    CatalogEntry("q_sql_expectations", expectations, Some(expectationsSql)),
    CatalogEntry("q_sql_profile", profile, Some(profileSql)),
    CatalogEntry("q_sql_merge", mergeUpsert, Some(mergeUpsertSql)),
    CatalogEntry("q_sql_unpivot", unpivotOp, Some(unpivotOpSql)),
    CatalogEntry("q_sql_datespine", dateSpine, Some(dateSpineSql)),
    CatalogEntry("q_sql_lateral", lateral, Some(lateralSql)),
    CatalogEntry("q_sql_cte", cte, Some(cteSql)),
    CatalogEntry("q_sql_recursive", recursiveCte, Some(recursiveCteSql)),
    CatalogEntry("q_sql_subquery_in", subqueryIn, Some(subqueryInSql)),
    CatalogEntry("q_sql_subquery_scalar", subqueryScalar, Some(subqueryScalarSql)),
    CatalogEntry("q_sql_pivot", pivot, Some(pivotSql)),
    CatalogEntry("q_sanitize", sanitizeOp, Some(sanitizeOpSql)))
}
