package graft.ops

import graft.{CatalogEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.B "Joins"). The reference reaches joins
  * only through SQL passthrough (its own metadata queries use 2-way and
  * 5-way INNER JOINs, reference: core/extractors/sqlserver.py:68-69,
  * 175-180); here each join type is a native Catalyst plan.
  *
  * Scale notes: dimension tables (region/nation/supplier, and part at
  * dim-like sizes) are broadcast explicitly so fact-side data never
  * shuffles for them; fact-fact joins (lineitem⋈orders) shuffle on the
  * join key and AQE handles skew.
  */
object Joins {

  /** Inner equi-join lineitem⋈orders + aggregation. Fact-fact: shuffle
    * hash/sort-merge on orderkey — both sides partition by the key, no
    * broadcast at 100 TB.
    */
  def innerJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.t(s, dir, "lineitem")
    val o = Tables.t(s, dir, "orders")
    li.join(o, li("l_orderkey") === o("o_orderkey"), "inner")
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n_items"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("revenue"))
      .orderBy($"o_orderpriority")
  }

  private val innerJoinSql =
    s"""SELECT o_orderpriority, COUNT(*) AS n_items,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)", 6)} AS revenue
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Left outer join: every customer, order stats over only big orders
    * (filtered right side ⇒ real null rows).
    */
  def leftJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.t(s, dir, "customer")
    val o = Tables.t(s, dir, "orders").filter($"o_totalprice" > 300000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy($"c_custkey")
      .agg(
        count($"o_orderkey").as("n_big_orders"),
        coalesce(dsum($"o_totalprice"), lit(0.0)).as("big_total"))
      .orderBy($"c_custkey")
  }

  private val leftJoinSql =
    s"""SELECT c_custkey, COUNT(o_orderkey) AS n_big_orders,
       |  coalesce(${dsumSql("o_totalprice")}, 0.0) AS big_total
       |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000.0) o
       |  ON c_custkey = o_custkey
       |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  /** Right outer join: recent lineitems RIGHT JOIN part — parts with no
    * recent shipment keep a zero count. Part is broadcast (dim side).
    */
  def rightJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.t(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("2001-06-01").cast("timestamp"))
    val p = Tables.t(s, dir, "part")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "right")
      .groupBy($"p_partkey")
      .agg(count($"l_orderkey").as("n_recent"))
      .orderBy($"p_partkey")
  }

  private val rightJoinSql =
    """SELECT p_partkey, COUNT(l_orderkey) AS n_recent
      |FROM (SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-06-01 00:00:00') li
      |RIGHT JOIN part ON l_partkey = p_partkey
      |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin

  /** Full outer join of two aggregates on nationkey. */
  def fullJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sup = Tables.t(s, dir, "supplier")
      .groupBy($"s_nationkey".as("k")).agg(count(lit(1)).as("n_supp"))
    val cust = Tables.t(s, dir, "customer")
      .filter($"c_acctbal" > 9000.0)
      .groupBy($"c_nationkey".as("k")).agg(count(lit(1)).as("n_rich_cust"))
    sup.join(cust, Seq("k"), "full")
      .select(
        $"k".as("nationkey"),
        coalesce($"n_supp", lit(0L)).as("n_supp"),
        coalesce($"n_rich_cust", lit(0L)).as("n_rich_cust"))
      .orderBy($"nationkey")
  }

  private val fullJoinSql =
    """WITH s AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1),
      |     c AS (SELECT c_nationkey AS k, COUNT(*) AS n_rich_cust FROM customer
      |           WHERE c_acctbal > 9000.0 GROUP BY 1)
      |SELECT coalesce(s.k, c.k) AS nationkey,
      |  coalesce(n_supp, 0) AS n_supp, coalesce(n_rich_cust, 0) AS n_rich_cust
      |FROM s FULL JOIN c ON s.k = c.k ORDER BY nationkey""".stripMargin

  /** Left semi join ≅ SQL EXISTS (Catalyst decorrelates the subquery
    * form to exactly this plan).
    */
  def semiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.t(s, dir, "customer")
    val o = Tables.t(s, dir, "orders").filter($"o_totalprice" > 400000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  private val semiJoinSql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin

  /** Left anti join ≅ SQL NOT EXISTS. */
  def antiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.t(s, dir, "customer")
    val o = Tables.t(s, dir, "orders").filter($"o_totalprice" > 400000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  private val antiJoinSql =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin

  /** Cross join (cartesian) of two tiny inputs. */
  def crossJoinSmall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val r = Tables.t(s, dir, "region").select($"r_name")
    val seg = Tables.t(s, dir, "customer").select($"c_mktsegment").distinct()
    r.crossJoin(seg).orderBy($"r_name", $"c_mktsegment")
  }

  private val crossJoinSmallSql =
    """SELECT r_name, c_mktsegment
      |FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) s
      |ORDER BY r_name, c_mktsegment""".stripMargin

  /** Range/interval theta join, band-bucketed into an equi-join so it
    * scales: both sides bin on floor(acctbal/width) where width = the
    * interval radius (100), the supplier side explodes to its bin and
    * the two neighbors (every |c−s| ≤ 100 pair lands in one of them),
    * the join is a plain hash equi-join on the bin, and the exact
    * BETWEEN runs as a post-filter. Per-pair dedup is structural — a
    * customer's single bin matches exactly one of the supplier's three
    * distinct bins. Replaces the naive formulation (broadcast(supplier)
    * + BroadcastNestedLoopJoin): supplier grows with scale factor
    * (~1M rows at sf100, past any safe broadcast) and the nested-loop
    * compare is O(|S|·|C|); the banded plan shuffles both sides once
    * on the bin key with fan-out bounded by the per-bin density. (FP
    * binning is safe here: acctbal has 2 decimals, so x/100 is ≥ 1e-4
    * from any integer it doesn't exactly equal — no boundary flips.)
    *
    * The oracle SQL deliberately stays the direct BETWEEN join — an
    * independent formulation, so the gate also proves the banding
    * rewrite loses/duplicates no pairs.
    */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sup = Tables.t(s, dir, "supplier")
      .select($"s_suppkey", $"s_acctbal",
        floor($"s_acctbal" / 100.0).as("bin0"))
      .select($"s_suppkey", $"s_acctbal",
        explode(array($"bin0" - 1, $"bin0", $"bin0" + 1)).as("bin"))
    val c = Tables.t(s, dir, "customer")
      .select($"c_acctbal", floor($"c_acctbal" / 100.0).as("bin"))
    sup.join(c, Seq("bin"))
      .filter($"c_acctbal".between($"s_acctbal" - 100.0, $"s_acctbal" + 100.0))
      .groupBy($"s_suppkey")
      .agg(count(lit(1)).as("n_near"))
      .orderBy($"s_suppkey")
  }

  private val rangeJoinSql =
    """SELECT s_suppkey, COUNT(*) AS n_near
      |FROM supplier JOIN customer
      |  ON c_acctbal BETWEEN s_acctbal - 100.0 AND s_acctbal + 100.0
      |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q5-style 6-way join: revenue per nation for one region.
    * region/nation broadcast (fixed-size dims: 5 / 25 rows at every
    * scale factor); supplier deliberately NOT hinted — it grows with
    * the scale factor (~1M rows at sf100, past any safe broadcast), so
    * AQE decides at runtime: broadcast while it's small, shuffle on
    * l_suppkey once it isn't. customer⋈orders⋈lineitem shuffle on
    * their keys.
    */
  def multiwayJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val r = Tables.t(s, dir, "region").filter($"r_name" === "ASIA")
    val n = Tables.t(s, dir, "nation")
    val c = Tables.t(s, dir, "customer")
    val o = Tables.t(s, dir, "orders")
    val li = Tables.t(s, dir, "lineitem")
    val sup = Tables.t(s, dir, "supplier")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(c, o("o_custkey") === c("c_custkey") &&
        c("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy($"n_name")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** TPC-H Q3 twin (shipping priority, adapted to the fixture's
    * columns): segment-filtered customers ⋈ open orders ⋈ late-shipped
    * lineitems, revenue-ranked top 10 order keys. The selective
    * dimension filter pushes to the customer scan, the date predicates
    * push to orders/lineitem, and the revenue aggregate rides the
    * l_orderkey join key — three pushed filters, two hash joins (small
    * sides broadcast at fixture scale), one rollup, TakeOrdered top-k.
    */
  def shippingPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cut = "1995-03-15"
    val c = Tables.t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
    val o = Tables.t(s, dir, "orders").filter($"o_orderdate" < lit(cut).cast("date"))
    val li = Tables.t(s, dir, "lineitem")
      .filter($"l_shipdate".cast("date") > lit(cut).cast("date"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy($"l_orderkey", $"o_orderdate".cast("date").as("o_orderdate"))
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 6).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey".asc)
      .limit(10)
  }

  private val shippingPrioritySql =
    s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)", 6)} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND CAST(o_orderdate AS DATE) < DATE '1995-03-15'
       |  AND CAST(l_shipdate AS DATE) > DATE '1995-03-15'
       |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  private val multiwayJoinSql =
    s"""SELECT n_name, ${dsumSql("l_extendedprice * (1.0 - l_discount)", 6)} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** As-of join: each event matched to the user's latest order at or
    * before the event time (AsOf.joinBackward; ties broken by max
    * o_orderkey, mirrored by the oracle's LATERAL ORDER BY ... LIMIT 1).
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.t(s, dir, "events")
      .select($"event_id", $"user_id", $"ts")
    val o = Tables.t(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
    AsOf.joinBackward(e, o, "user_id", "o_custkey", "ts", "o_orderdate", "o_orderkey")
      .select($"event_id", $"user_id", $"o_orderkey", $"o_orderdate", $"o_totalprice")
      .orderBy($"event_id")
  }

  private val asofJoinSql =
    """SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate, o.o_totalprice
      |FROM events e LEFT JOIN LATERAL (
      |  SELECT o_orderkey, o_orderdate, o_totalprice FROM orders o
      |  WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
      |  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1
      |) o ON TRUE
      |ORDER BY e.event_id""".stripMargin

  def entries: Seq[CatalogEntry] = Seq(
    CatalogEntry("q_join_inner", innerJoin, Some(innerJoinSql)),
    CatalogEntry("q_join_left", leftJoin, Some(leftJoinSql)),
    CatalogEntry("q_join_right", rightJoin, Some(rightJoinSql)),
    CatalogEntry("q_join_full", fullJoin, Some(fullJoinSql)),
    CatalogEntry("q_join_semi", semiJoin, Some(semiJoinSql)),
    CatalogEntry("q_join_anti", antiJoin, Some(antiJoinSql)),
    CatalogEntry("q_join_cross", crossJoinSmall, Some(crossJoinSmallSql)),
    CatalogEntry("q_join_range", rangeJoin, Some(rangeJoinSql)),
    CatalogEntry("q5_multiway", multiwayJoin, Some(multiwayJoinSql)),
    CatalogEntry("q3_shipping", shippingPriority, Some(shippingPrioritySql)),
    CatalogEntry("q_asof_join", asofJoin, Some(asofJoinSql)))
}
