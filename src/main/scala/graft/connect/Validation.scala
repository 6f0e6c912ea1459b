package graft.connect

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality expectations — the reference DECLARES this surface
  * (`services/validation_service.py`, 0 bytes on disk; SURVEY.md §0
  * treats declared files as the capability contract) but never
  * implemented it. The shape follows what every public expectation
  * framework converged on: a small rule ADT evaluated as aggregates,
  * reporting violation counts per rule.
  *
  * Scale design: all column rules against the SAME table fuse into ONE
  * aggregation pass over one scan (conditional sums + the
  * count−countDistinct uniqueness identity ride the same partial agg),
  * so validating a 100 TB table costs one read regardless of how many
  * rules it carries. Referential rules are each one equi-anti-join on
  * the FK key — the only rules that can't fuse, because they touch two
  * tables.
  */
object Validation {

  /** One expectation; `name` becomes the report key. */
  sealed trait Rule { def name: String }

  /** Rules evaluable inside a single-table aggregation pass. */
  sealed trait ColumnRule extends Rule { def table: String }

  final case class NotNull(table: String, column: String) extends ColumnRule {
    def name = s"not_null:$table.$column"
  }
  /** Inclusive numeric bounds; NULLs don't count as violations (that's
    * [[NotNull]]'s job — same separation as SQL CHECK semantics). */
  final case class InRange(table: String, column: String, lo: Double, hi: Double)
      extends ColumnRule {
    def name = s"range:$table.$column[$lo,$hi]"
  }
  final case class AcceptedValues(table: String, column: String, values: Seq[String])
      extends ColumnRule {
    def name = s"accepted:$table.$column{${values.mkString(",")}}"
  }
  final case class Unique(table: String, column: String) extends ColumnRule {
    def name = s"unique:$table.$column"
  }
  /** Child rows whose key has no parent (NULL child keys don't violate,
    * matching SQL FK semantics). */
  final case class RefIntegrity(table: String, column: String,
      refTable: String, refColumn: String) extends Rule {
    def name = s"fk:$table.$column->$refTable.$refColumn"
  }

  private def violationAgg(r: ColumnRule): Column = r match {
    case NotNull(_, c) =>
      sum(when(col(c).isNull, 1L).otherwise(0L))
    case InRange(_, c, lo, hi) =>
      sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L))
    case AcceptedValues(_, c, vs) =>
      sum(when(!col(c).isin(vs: _*), 1L).otherwise(0L))
    case Unique(_, c) =>
      count(col(c)) - countDistinct(col(c))
  }

  /** Evaluate `rules`, returning (rule, violations, pass) ordered by
    * rule name. */
  def run(s: SparkSession, dir: String, rules: Seq[Rule]): DataFrame = {
    val perTable = rules.collect { case r: ColumnRule => r }
      .groupBy(_.table).toSeq.map { case (t, rs) =>
        val aggs = rs.zipWithIndex.map { case (r, i) => violationAgg(r).as(s"a$i") }
        val stackArgs = rs.zipWithIndex
          .map { case (r, i) => s"'${r.name}', a$i" }.mkString(", ")
        Tables.t(s, dir, t)
          .agg(aggs.head, aggs.tail: _*)
          .selectExpr(s"stack(${rs.size}, $stackArgs) AS (rule, violations)")
      }
    val fkChecks = rules.collect { case f: RefIntegrity =>
      Tables.t(s, dir, f.table)
        .select(col(f.column)).filter(col(f.column).isNotNull)
        .join(Tables.t(s, dir, f.refTable).select(col(f.refColumn)),
          col(f.column) === col(f.refColumn), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit(f.name).as("rule"), col("violations"))
    }
    (perTable ++ fkChecks).reduce(_ unionByName _)
      .select(col("rule"), col("violations"),
        (col("violations") === 0L).as("pass"))
      .orderBy("rule")
  }

  /** The fixture expectation suite for the catalog row — a deliberate
    * mix of passing rules and rules with nonzero violation counts, so
    * the DuckDB gate checks real counting, not just a column of
    * zeros: quantity capped at 25 fails for half of lineitem, flag
    * {A,N} misses every R row, l_orderkey repeats across line numbers.
    */
  val fixtureRules: Seq[Rule] = Seq(
    NotNull("lineitem", "l_orderkey"),
    InRange("lineitem", "l_quantity", 1, 25),
    AcceptedValues("lineitem", "l_returnflag", Seq("A", "N")),
    Unique("lineitem", "l_orderkey"),
    Unique("orders", "o_orderkey"),
    RefIntegrity("lineitem", "l_orderkey", "orders", "o_orderkey"),
    NotNull("documents", "text"))

  /** Row-level snapshot diff — the data half of [[MetadataService]]'s
    * schemaDiff and the check an incremental loader runs before
    * promoting a new snapshot: full-outer join two snapshots on the
    * key, classify every key as added / removed / changed / unchanged
    * (changed = any compared column differs, null-safe), and roll up to
    * one row per status with count and key range — bounded output
    * regardless of table size. One shuffle per side on the join key;
    * the status classification and rollup ride it. At 100 TB both
    * sides are key-partitioned scans and the rollup is map-side
    * combinable; a bucketed table layout ([[Sources]]) makes the join
    * co-located.
    */
  def dataDiff(a: DataFrame, b: DataFrame, key: String,
      compare: Seq[String]): DataFrame = {
    require(compare.nonEmpty, "dataDiff needs at least one compare column")
    // presence markers + a null-safe join: a NULL-keyed row must not be
    // classified by key nullness (the outer join never matches NULL with
    // ===, which inverted added/removed for such rows), so membership is
    // carried explicitly and NULL keys pair up via <=>
    val an = a.select(lit(1).as("__in_a") +:
      (key +: compare).map(c => col(c).as(s"a_$c")): _*)
    val bn = b.select(lit(1).as("__in_b") +:
      (key +: compare).map(c => col(c).as(s"b_$c")): _*)
    val changed = compare
      .map(c => !(col(s"a_$c") <=> col(s"b_$c")))
      .reduce(_ || _)
    an.join(bn, col(s"a_$key") <=> col(s"b_$key"), "full_outer")
      .select(
        when(col("__in_a").isNull, "added")
          .when(col("__in_b").isNull, "removed")
          .when(changed, "changed")
          .otherwise("unchanged").as("status"),
        coalesce(col(s"a_$key"), col(s"b_$key")).as("key"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"),
        min(col("key")).as("min_key"), max(col("key")).as("max_key"))
      .orderBy(col("status"))
  }
}
