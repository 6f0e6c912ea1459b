package graft.ops

import graft.{CatalogEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-preparation operators — the normalization/binning passes a
  * training pipeline runs after cleaning and before materializing
  * features. Cross-engine determinism follows the repo's integer-
  * bridge discipline: every statistic derives from EXACT integer sums
  * (longs that fit a double's 53-bit mantissa), so the final IEEE
  * divisions/sqrt are bit-identical in Spark and DuckDB.
  */
object FeatureOps {

  /** Per-group z-score normalization of l_quantity (an integer-valued
    * measure, so sum and sum-of-squares stay exact longs: q ≤ 50,
    * q² ≤ 2500, sums ≪ 2⁵³). Stats come from ONE narrow group-by —
    * vocabulary-sized, broadcast back onto the rows — not a window, so
    * the 100 TB plan is scan + tiny-dim broadcast join instead of a
    * full-table sort. Variance uses the textbook (S2 − S²/n)/n with
    * every intermediate exactly representable; z is two IEEE ops.
    * Row subset keeps the gate output bounded; stats are computed over
    * the FULL table before the subset filter.
    */
  def zscore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag",
        $"l_quantity".cast("long").as("q"))
    val stats = li.groupBy($"l_returnflag")
      .agg(sum($"q").as("s1"), sum($"q" * $"q").as("s2"),
        count(lit(1)).as("n"))
      .select($"l_returnflag",
        ($"s1".cast("double") / $"n").as("mean_q"),
        (($"s2".cast("double") - $"s1".cast("double") * $"s1" / $"n") / $"n").as("var_q"))
    li.filter($"l_orderkey" < 500)
      .join(broadcast(stats), Seq("l_returnflag"))
      .select($"l_orderkey", $"l_linenumber", $"l_returnflag", $"q",
        (($"q" - $"mean_q") / sqrt($"var_q")).as("z"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  private val zscoreSql =
    """WITH li AS (
      |  SELECT l_orderkey, l_linenumber, l_returnflag,
      |    CAST(l_quantity AS BIGINT) AS q
      |  FROM lineitem),
      |stats AS (
      |  SELECT l_returnflag,
      |    CAST(SUM(q) AS DOUBLE) / COUNT(*) AS mean_q,
      |    (CAST(SUM(q * q) AS DOUBLE)
      |      - CAST(SUM(q) AS DOUBLE) * CAST(SUM(q) AS BIGINT) / COUNT(*))
      |      / COUNT(*) AS var_q
      |  FROM li GROUP BY 1)
      |SELECT l_orderkey, l_linenumber, l_returnflag, q,
      |  (q - mean_q) / sqrt(var_q) AS z
      |FROM li JOIN stats USING (l_returnflag)
      |WHERE l_orderkey < 500
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Equi-depth binning: NTILE(10) over extended price with a total
    * tiebreak, reporting each decile's row count and [min, max] price
    * bounds in cents — the quantile-bucketing table feature stores
    * materialize. One global sort (TakeOrdered-style range partition)
    * + a 10-row rollup.
    */
  def ntileBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.orderBy($"cents".asc, $"l_orderkey".asc, $"l_linenumber".asc)
    Tables.t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber",
        round($"l_extendedprice" * 100).cast("long").as("cents"))
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n"),
        min($"cents").as("min_cents"), max($"cents").as("max_cents"))
      .orderBy($"decile")
  }

  private val ntileBucketsSql =
    """WITH c AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem),
      |d AS (
      |  SELECT cents,
      |    CAST(ntile(10) OVER (ORDER BY cents, l_orderkey, l_linenumber) AS BIGINT) AS decile
      |  FROM c)
      |SELECT decile, COUNT(*) AS n,
      |  min(cents) AS min_cents, max(cents) AS max_cents
      |FROM d GROUP BY 1 ORDER BY decile""".stripMargin

  def entries: Seq[CatalogEntry] = Seq(
    CatalogEntry("q_feat_zscore", zscore, Some(zscoreSql)),
    CatalogEntry("q_feat_ntile", ntileBuckets, Some(ntileBucketsSql)))
}
