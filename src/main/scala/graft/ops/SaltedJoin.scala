package graft.ops

import graft.{CatalogEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Key-salting for skewed equi-joins (SURVEY.md "Partitioning &
  * shuffle"; complements AQE's runtime skew splitting with a static
  * plan-level tool). The hot side gets a salt in [0, n) appended to its
  * key; the other side replicates each row n times with every salt;
  * the join key becomes (key, salt) so one hot key spreads over n
  * shuffle partitions. Semantics-preserving by construction — the
  * catalog entry's oracle is the PLAIN join, which is exactly the
  * property that makes salting safe to apply at 100 TB.
  */
object SaltedJoin {

  /** Inner equi-join of `skewed` (hot keys) with `small` on
    * skewedKey == smallKey, salted `salts` ways. The salt is
    * `pmod(hash(row id cols), n)` — any assignment in [0,n) yields the
    * same join result; hash keeps it deterministic per row.
    */
  def inner(
      skewed: DataFrame,
      small: DataFrame,
      skewedKey: String,
      smallKey: String,
      salts: Int,
      saltBy: Seq[String]): DataFrame = {
    val l = skewed.withColumn("_salt",
      pmod(hash(saltBy.map(col).toIndexedSeq: _*), lit(salts)))
    val r = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, l(skewedKey) === r(smallKey) && l("_salt") === r("_salt"), "inner")
      .drop("_salt")
  }

  /** Catalog entry: the events→customer enrichment join salted 8 ways,
    * aggregated per nation. Oracle = the plain join (salting must not
    * change results).
    */
  def saltedEnrich(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.t(s, dir, "events").select($"user_id", $"value")
    val c = Tables.t(s, dir, "customer").select($"c_custkey", $"c_nationkey")
    inner(e, c, "user_id", "c_custkey", salts = 8, saltBy = Seq("user_id", "value"))
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
      .orderBy($"c_nationkey")
  }

  private val saltedEnrichSql =
    s"""SELECT c_nationkey, COUNT(*) AS n, ${dsumSql("value")} AS sum_value
       |FROM events JOIN customer ON user_id = c_custkey
       |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  def entries: Seq[CatalogEntry] = Seq(
    CatalogEntry("q_join_salted", saltedEnrich, Some(saltedEnrichSql)))
}
