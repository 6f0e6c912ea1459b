package graft.ops

import graft.{CatalogEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Projection / filter / predicate operators (SURVEY.md §2.B
  * "Projection / filter / predicates"). The reference reaches these via
  * raw SQL passthrough (reference: core/extractors/sqlserver.py:46-55);
  * here they are native Catalyst plans with filters/projections pushed
  * into the parquet scan.
  */
object Relational {

  /** Flagship: TPC-H Q1-style pricing summary — scan + pushed predicate +
    * hash aggregation (partial+final) + sort. Decimal bridge for
    * deterministic float sums (see ops package doc).
    */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("2000-12-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 8).as("sum_disc_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"), 8).as("sum_charge"),
        (dsum($"l_quantity") / count(lit(1))).as("avg_qty"),
        (dsum($"l_extendedprice") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val pricingSummarySql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsumSql("l_quantity")} AS sum_qty,
       |  ${dsumSql("l_extendedprice")} AS sum_base_price,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)", 8)} AS sum_disc_price,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 8)} AS sum_charge,
       |  ${dsumSql("l_quantity")} / COUNT(*) AS avg_qty,
       |  ${dsumSql("l_extendedprice")} / COUNT(*) AS avg_price,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Project / rename / computed columns. */
  def project(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "part")
      .select(
        $"p_partkey",
        $"p_size".as("size_i"),
        upper($"p_brand").as("brand_u"),
        ($"p_retailprice" * lit(1.1)).as("bumped_price"),
        concat_ws("/", $"p_brand", $"p_type").as("brand_type"))
      .orderBy($"p_partkey")
  }

  private val projectSql: String =
    """SELECT p_partkey, p_size AS size_i, upper(p_brand) AS brand_u,
      |  p_retailprice * 1.1 AS bumped_price,
      |  concat_ws('/', p_brand, p_type) AS brand_type
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Filter: comparison, AND/OR/NOT, IN, BETWEEN, LIKE, NULLIF + IS NULL. */
  def filterPredicates(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "orders")
      .filter(
        $"o_orderstatus".isin("O", "F") &&
          $"o_totalprice".between(50000.0, 200000.0) &&
          $"o_orderpriority".like("%URGENT%") &&
          !($"o_custkey" % 10 === 0) &&
          nullif($"o_orderstatus", lit("P")).isNotNull)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderpriority")
      .orderBy($"o_orderkey")
  }

  private val filterPredicatesSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      |FROM orders
      |WHERE o_orderstatus IN ('O','F')
      |  AND o_totalprice BETWEEN 50000.0 AND 200000.0
      |  AND o_orderpriority LIKE '%URGENT%'
      |  AND NOT (o_custkey % 10 = 0)
      |  AND nullif(o_orderstatus, 'P') IS NOT NULL
      |ORDER BY o_orderkey""".stripMargin

  /** CASE WHEN bucketing + aggregation over the buckets. */
  def caseWhen(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "lineitem")
      .select(
        when($"l_quantity" < 10, "low")
          .when($"l_quantity" < 30, "mid")
          .otherwise("high").as("qty_bucket"),
        $"l_quantity")
      .groupBy($"qty_bucket")
      .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("sum_qty"))
      .orderBy($"qty_bucket")
  }

  private val caseWhenSql: String =
    s"""SELECT CASE WHEN l_quantity < 10 THEN 'low'
       |            WHEN l_quantity < 30 THEN 'mid'
       |            ELSE 'high' END AS qty_bucket,
       |  COUNT(*) AS n, ${dsumSql("l_quantity")} AS sum_qty
       |FROM lineitem GROUP BY 1 ORDER BY qty_bucket""".stripMargin

  /** DISTINCT / dropDuplicates. */
  def distinctRows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "customer")
      .select($"c_mktsegment", $"c_nationkey")
      .distinct()
      .orderBy($"c_mktsegment", $"c_nationkey")
  }

  private val distinctRowsSql: String =
    """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
      |ORDER BY c_mktsegment, c_nationkey""".stripMargin

  /** Null-handling scalars: COALESCE, NULLIF, NVL, GREATEST/LEAST. */
  def nullFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "customer")
      .select(
        $"c_custkey",
        coalesce(nullif($"c_mktsegment", lit("BUILDING")), lit("(bldg)")).as("seg_or_tag"),
        nvl(nullif($"c_nationkey", lit(0)), lit(-1)).as("nation_or_neg"),
        greatest($"c_acctbal", lit(0.0)).as("bal_floor0"),
        least($"c_acctbal", lit(5000.0)).as("bal_cap"))
      .orderBy($"c_custkey")
  }

  private val nullFuncsSql: String =
    """SELECT c_custkey,
      |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(bldg)') AS seg_or_tag,
      |  coalesce(nullif(c_nationkey, 0), -1) AS nation_or_neg,
      |  greatest(c_acctbal, 0.0) AS bal_floor0,
      |  least(c_acctbal, 5000.0) AS bal_cap
      |FROM customer ORDER BY c_custkey""".stripMargin

  def entries: Seq[CatalogEntry] = Seq(
    CatalogEntry("q1_pricing", pricingSummary, Some(pricingSummarySql)),
    CatalogEntry("q_project", project, Some(projectSql)),
    CatalogEntry("q_filter_pred", filterPredicates, Some(filterPredicatesSql)),
    CatalogEntry("q_case_when", caseWhen, Some(caseWhenSql)),
    CatalogEntry("q_distinct", distinctRows, Some(distinctRowsSql)),
    CatalogEntry("q_null_funcs", nullFuncs, Some(nullFuncsSql)))
}
