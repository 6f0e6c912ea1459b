package graft.ops

import graft.{CatalogEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Equi-depth binning: exact NTILE(10) semantics over extended price
    * with a total tiebreak, reporting each decile's row count and
    * [min, max] price bounds in cents — the quantile-bucketing table
    * feature stores materialize.
    *
    * NOT a window: `Window.orderBy` with no partitionBy plans
    * `Exchange SinglePartition` — every row through one task, the
    * classic 100 TB scale-killer. Instead, the exact two-pass
    * boundary algorithm: (1) range-repartition on the sort key — a
    * DISTRIBUTED sort, each of P partitions holds one key range —
    * then index rows within the range order (`zipWithIndex`: one
    * count-per-partition job + offsets) and pull out the 9 rows
    * sitting at the exact NTILE bucket-end ranks (bucket k of n rows
    * ends at rank k·⌊n/10⌋ + min(k, n mod 10) − 1, bigger buckets
    * first — NTILE's tie-free contract under a total order); (2) the
    * 9 boundary keys become broadcast literals and bucket assignment
    * is a map-side comparison ladder (decile = 1 + #boundaries below
    * the row's key), followed by a 10-group hash rollup. Driver
    * traffic is 9 tuples; no stage sees more than n/P rows. The
    * DuckDB oracle keeps the plain NTILE formulation as the
    * independent check that the two-pass boundaries ARE ntile's.
    */
  def ntileBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_linenumber".cast("long").as("ln"),
        round($"l_extendedprice" * 100).cast("long").as("cents"))
    val sortKeys = Seq($"cents".asc, $"l_orderkey".asc, $"ln".asc)
    val parts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = base.repartitionByRange(parts, sortKeys: _*)
      .sortWithinPartitions(sortKeys: _*)
      .persist()
    val n = sorted.count()
    val rollup = (d: DataFrame) => d
      .groupBy($"decile")
      .agg(count(lit(1)).as("n"),
        min($"cents").as("min_cents"), max($"cents").as("max_cents"))
      .orderBy($"decile")
    if (n == 0) { sorted.unpersist(); return rollup(base.withColumn("decile", lit(1L))) }
    val bucket = n / 10
    val rem = n % 10
    // 1-indexed bucket k ends at 0-indexed global rank cum(k)-1; keep
    // duplicates (n < 10 degenerates some buckets to empty) so the
    // comparison ladder still counts multiplicity like NTILE does
    val boundRanks: Seq[Long] = (1 to 9).map(k => k.toLong * bucket + math.min(k, rem) - 1)
    val wanted = boundRanks.toSet
    val boundKeyAt: Map[Long, (Long, Long, Long)] = sorted.rdd.zipWithIndex()
      .filter { case (_, i) => wanted.contains(i) }
      .map { case (r, i) => i -> ((r.getLong(2), r.getLong(0), r.getLong(1))) }
      .collect().toMap
    sorted.unpersist()
    val decile = boundRanks.map { rk =>
      val (c, o, l) = boundKeyAt(rk)
      when($"cents" > c ||
        ($"cents" === c && ($"l_orderkey" > o || ($"l_orderkey" === o && $"ln" > l))),
        1L).otherwise(0L)
    }.reduce(_ + _) + lit(1L)
    rollup(base.withColumn("decile", decile))
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
