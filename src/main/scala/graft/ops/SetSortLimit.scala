package graft.ops

import graft.{CatalogEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sort / limit / top-k / set operations / sampling (SURVEY.md §2.B).
  * The reference's own metadata SQL uses multi-key ORDER BY
  * (reference: core/extractors/sqlserver.py:100,129,181).
  */
object SetSortLimit {

  /** Global multi-key ORDER BY with explicit null placement and
    * mixed directions — Spark range-partitions the sort at scale.
    */
  def orderByMulti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "customer")
      .select($"c_custkey", $"c_mktsegment", $"c_nationkey", $"c_acctbal",
        nullif($"c_mktsegment", lit("MACHINERY")).as("seg_nullable"))
      .orderBy($"seg_nullable".desc_nulls_last, $"c_nationkey".asc,
        $"c_acctbal".desc, $"c_custkey".asc)
  }

  private val orderByMultiSql =
    """SELECT c_custkey, c_mktsegment, c_nationkey, c_acctbal,
      |  nullif(c_mktsegment, 'MACHINERY') AS seg_nullable
      |FROM customer
      |ORDER BY seg_nullable DESC NULLS LAST, c_nationkey ASC,
      |  c_acctbal DESC, c_custkey ASC""".stripMargin

  /** Global top-k: ORDER BY + LIMIT → Catalyst TakeOrderedAndProject
    * (per-partition heaps, no full sort — the at-scale shape).
    */
  def topK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "orders")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(25)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
  }

  private val topKSql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""".stripMargin

  /** UNION ALL + UNION (distinct) over aligned projections. */
  def unionOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.t(s, dir, "customer")
      .select($"c_nationkey".as("nationkey"), lit("customer").as("side"))
    val sup = Tables.t(s, dir, "supplier")
      .select($"s_nationkey".as("nationkey"), lit("supplier").as("side"))
    c.unionByName(sup).distinct()
      .unionByName(
        Tables.t(s, dir, "nation")
          .select($"n_nationkey".as("nationkey"), lit("nation").as("side")))
      .orderBy($"nationkey", $"side")
  }

  private val unionOpsSql =
    """SELECT * FROM (
      |  SELECT DISTINCT * FROM (
      |    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
      |    UNION ALL
      |    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier) u
      |  UNION ALL
      |  SELECT n_nationkey AS nationkey, 'nation' AS side FROM nation) v
      |ORDER BY nationkey, side""".stripMargin

  /** INTERSECT: nations present among both big-balance customers and
    * suppliers.
    */
  def intersectOp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.t(s, dir, "customer").filter($"c_acctbal" > 5000.0)
      .select($"c_nationkey".as("nationkey"))
    val sup = Tables.t(s, dir, "supplier").filter($"s_acctbal" > 5000.0)
      .select($"s_nationkey".as("nationkey"))
    c.intersect(sup).orderBy($"nationkey")
  }

  private val intersectOpSql =
    """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000.0
      |INTERSECT
      |SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000.0
      |ORDER BY nationkey""".stripMargin

  /** EXCEPT and EXCEPT ALL (multiset difference keeps multiplicity). */
  def exceptOp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val all = Tables.t(s, dir, "customer").select($"c_nationkey".as("nationkey"))
    val sup = Tables.t(s, dir, "supplier").select($"s_nationkey".as("nationkey"))
    val distinctDiff = all.except(sup)
      .withColumn("kind", lit("except_distinct"))
    val multisetDiff = Tables.t(s, dir, "nation")
      .select($"n_nationkey".as("nationkey"))
      .exceptAll(sup)
      .withColumn("kind", lit("except_all"))
    distinctDiff.unionByName(multisetDiff).orderBy($"kind", $"nationkey")
  }

  private val exceptOpSql =
    """SELECT * FROM (
      |  SELECT c_nationkey AS nationkey, 'except_distinct' AS kind FROM customer
      |  EXCEPT
      |  SELECT s_nationkey, 'except_distinct' FROM supplier)
      |UNION ALL
      |SELECT * FROM (
      |  SELECT n_nationkey AS nationkey, 'except_all' AS kind FROM nation
      |  EXCEPT ALL
      |  SELECT s_nationkey, 'except_all' FROM supplier)
      |ORDER BY kind, nationkey""".stripMargin

  /** TABLESAMPLE — seeded Bernoulli sample. Sampling RNGs differ across
    * engines, so the raw sampled rows can't be hash-compared; instead
    * the query emits deterministic invariant booleans the oracle
    * asserts as TRUE: the 10% sample's size lands inside a ±20%
    * relative band (≳5σ of Binomial(N, 0.1) at sf0.01), and re-sampling
    * with the same seed reproduces the identical count.
    */
  def sampleOp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.t(s, dir, "lineitem")
    val s1 = li.sample(withReplacement = false, 0.1, seed = 42L)
      .agg(count(lit(1)).as("n1"))
    val s2 = li.sample(withReplacement = false, 0.1, seed = 42L)
      .agg(count(lit(1)).as("n2"))
    val total = li.agg(count(lit(1)).as("n_total"))
    s1.crossJoin(s2).crossJoin(total)
      .select(
        ($"n1".cast("double") >= $"n_total".cast("double") * 0.08 &&
          $"n1".cast("double") <= $"n_total".cast("double") * 0.12).as("n_in_bounds"),
        ($"n1" === $"n2").as("seed_stable"))
  }

  private val sampleOpSql =
    "SELECT TRUE AS n_in_bounds, TRUE AS seed_stable"

  /** Stratified sampling with a fixed per-stratum quota — the
    * domain-mixing primitive of a training-data pipeline ("k docs per
    * language"), made fully deterministic and hence hash-comparable:
    * the sample order is md5 of the doc id (a seeded-shuffle stand-in
    * both engines compute identically), so the quota takes the same k
    * pseudo-random docs everywhere. One shuffle on the stratum key +
    * per-stratum top-k window; at 100 TB the rank-k cutoff pushes down
    * as a WindowGroupLimit so each partition keeps k rows, not all.
    */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 20
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy(md5($"doc_id".cast("string")).asc, $"doc_id".asc)
    Tables.t(s, dir, "documents")
      .select($"doc_id", $"lang", $"source")
      .withColumn("pick", row_number().over(w).cast("long"))
      .filter($"pick" <= k)
      .orderBy($"lang", $"pick")
  }

  private val stratifiedSampleSql =
    """SELECT doc_id, lang, source, pick FROM (
      |  SELECT doc_id, lang, source,
      |    CAST(row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS BIGINT) AS pick
      |  FROM documents) t
      |WHERE pick <= 20 ORDER BY lang, pick""".stripMargin

  /** Weighted sampling without replacement — the quality-proportional
    * corpus-mixing draw ("sample documents ∝ quality score"): a
    * deterministic priority race in the exponential-race family, kept
    * ENTIRELY on integers so the gate hash holds. Per doc: a uniform
    * u from the Knuth multiplicative hash of doc_id (pure int64, both
    * engines), priority = u·10⁹ div weight (weight = n_chars here, any
    * positive score in practice), keep the 10 LOWEST priorities per
    * language — heavier docs draw systematically smaller keys, so
    * selection probability rises with weight. The textbook A-ES key
    * u^(1/w) needs pow/log — transcendental, so never bit-identical
    * across engines; the integer rational key preserves the u/w race
    * ordering (monotone transform) with zero float ops. Plan: one
    * hash(lang) exchange; the rank-≤-10 predicate pushes into
    * WindowGroupLimit (per-partition heaps), the [[stratifiedSample]]
    * shape — no global sort at any scale.
    */
  def weightedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"priority".asc, $"doc_id".asc)
    // doc_id is reduced mod the Knuth constant BEFORE the multiply:
    // (c-1)·c ≈ 7.0e18 stays inside int64, where a raw 64-bit id times
    // c overflows (ANSI Spark throws, DuckDB errors). A no-op at
    // fixture ids (< c), identical u either way there. The oracle's
    // ((x % c) + c) % c mirrors pmod for NEGATIVE ids too — DuckDB %
    // keeps the sign, pmod never does, so the plain form would build
    // a different sample the day a fixture ships negative ids.
    Tables.t(s, dir, "documents")
      .select($"doc_id", $"lang", $"n_chars",
        (pmod(pmod($"doc_id", lit(2654435761L)) * lit(2654435761L),
          lit(1048576L)) + 1L).as("u"))
      .withColumn("priority", expr("(u * 1000000000) div n_chars"))
      .withColumn("pick", row_number().over(w).cast("long"))
      .filter($"pick" <= 10)
      .select($"lang", $"pick", $"doc_id", $"n_chars", $"priority")
      .orderBy($"lang", $"pick")
  }

  private val weightedSampleSql =
    """WITH p AS (
      |  SELECT doc_id, lang, n_chars,
      |    ((((doc_id % 2654435761) + 2654435761) % 2654435761
      |       * 2654435761) % 1048576 + 1)
      |      * 1000000000 // n_chars AS priority
      |  FROM documents),
      |r AS (
      |  SELECT lang, doc_id, n_chars, priority,
      |    CAST(row_number() OVER (PARTITION BY lang
      |      ORDER BY priority ASC, doc_id ASC) AS BIGINT) AS pick
      |  FROM p)
      |SELECT lang, pick, doc_id, n_chars, CAST(priority AS BIGINT) AS priority
      |FROM r WHERE pick <= 10 ORDER BY lang, pick""".stripMargin

  def entries: Seq[CatalogEntry] = Seq(
    CatalogEntry("q_sample_weighted", weightedSample, Some(weightedSampleSql)),
    CatalogEntry("q_sample_stratified", stratifiedSample, Some(stratifiedSampleSql)),
    CatalogEntry("q_orderby_multi", orderByMulti, Some(orderByMultiSql)),
    CatalogEntry("q_topk", topK, Some(topKSql)),
    CatalogEntry("q_union", unionOps, Some(unionOpsSql)),
    CatalogEntry("q_intersect", intersectOp, Some(intersectOpSql)),
    CatalogEntry("q_except", exceptOp, Some(exceptOpSql)),
    CatalogEntry("q_sample", sampleOp, Some(sampleOpSql)))
}
