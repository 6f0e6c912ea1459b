package graft.connect

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{StructField, StructType}

/** One FK edge ≅ a row of the reference's FK introspection query
  * (core/extractors/sqlserver.py:155-198: table, column, ref_table,
  * ref_column via a 5-way join over sys.*).
  */
final case class FkEdge(table: String, column: String, refTable: String, refColumn: String)

/** Catalog metadata service (SURVEY.md §2.A A2-A5). Tables/columns come
  * from the Spark catalog; the FK graph — which Spark has no built-in
  * for — is declared configuration used for join suggestion/lineage.
  */
final class MetadataService(spark: SparkSession, fks: Seq[FkEdge] = MetadataService.fixtureFks) {

  /** ≅ A2 list tables. */
  def listTables(): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).toSeq.sorted

  /** ≅ A3/A4 columns of one table: (name, dataType, nullable). */
  def tableSchema(table: String): Seq[(String, String, Boolean)] =
    spark.table(table).schema.fields.toSeq
      .map(f => (f.name, f.dataType.simpleString, f.nullable))

  /** ≅ A5 FK relation graph. */
  def foreignKeys: Seq[FkEdge] = fks

  /** Join suggestion from the FK graph: the equi-join condition columns
    * between two tables, if an edge exists either direction.
    */
  def suggestJoin(t1: String, t2: String): Option[(String, String)] =
    fks.collectFirst {
      case FkEdge(`t1`, c, `t2`, rc) => (c, rc)
      case FkEdge(`t2`, c, `t1`, rc) => (rc, c)
    }

  /** Schema drift between two snapshots of a table — the check an
    * incremental loader runs before appending today's extract to
    * yesterday's target (the reference introspects schemas for its
    * load-side DDL, core/loaders/sqlserver.py:185-230; drift detection
    * is the missing half of that contract). Returns one row per
    * changed column: (column, change ∈ added|removed|retyped,
    * beforeType, afterType) — nullability loosening/tightening counts
    * as a retype because the reference's DDL carries NOT NULL.
    */
  def schemaDiff(before: StructType, after: StructType): Seq[(String, String, String, String)] = {
    def m(s: StructType) = s.fields.map(f =>
      f.name -> (f.dataType.simpleString + (if (f.nullable) "" else " not null"))).toMap
    val b = m(before); val a = m(after)
    val removed = (b.keySet -- a.keySet).toSeq.sorted.map(c => (c, "removed", b(c), ""))
    val added = (a.keySet -- b.keySet).toSeq.sorted.map(c => (c, "added", "", a(c)))
    val retyped = (b.keySet & a.keySet).toSeq.sorted
      .filter(c => b(c) != a(c)).map(c => (c, "retyped", b(c), a(c)))
    removed ++ added ++ retyped
  }
}

object MetadataService {
  /** The fixture join graph (FIXTURES.md). */
  val fixtureFks: Seq[FkEdge] = Seq(
    FkEdge("lineitem", "l_orderkey", "orders", "o_orderkey"),
    FkEdge("lineitem", "l_partkey", "part", "p_partkey"),
    FkEdge("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    FkEdge("orders", "o_custkey", "customer", "c_custkey"),
    FkEdge("customer", "c_nationkey", "nation", "n_nationkey"),
    FkEdge("supplier", "s_nationkey", "nation", "n_nationkey"),
    FkEdge("nation", "n_regionkey", "region", "r_regionkey"))
}

/** Target-schema handling ≅ the reference's auto-create-DDL path
  * (core/loaders/sqlserver.py:83-239, SURVEY.md §2.A A9): copy schema
  * from a source table pruned to the DataFrame's columns, else derive
  * from the frame's own types.
  */
object TargetSchema {

  /** "Copy schema from source table, pruned to df columns"
    * (core/loaders/sqlserver.py:173-175: columns absent from the frame
    * are dropped from the DDL).
    */
  def prunedTo(source: StructType, df: StructType): StructType = {
    val keep = df.fieldNames.toSet
    StructType(source.fields.filter(f => keep(f.name)))
  }

  /** Spark type → SQL DDL type, per the reference's dtype fallback map
    * (core/loaders/sqlserver.py:223-230) with one deliberate fidelity
    * break recorded in SURVEY.md §1.2: 64-bit ints stay BIGINT (the
    * reference narrows int64 → INT).
    */
  def ddlType(f: StructField): String = f.dataType match {
    case org.apache.spark.sql.types.LongType => "BIGINT"
    case org.apache.spark.sql.types.IntegerType => "INT"
    case org.apache.spark.sql.types.DoubleType => "FLOAT"
    case org.apache.spark.sql.types.FloatType => "REAL"
    case org.apache.spark.sql.types.BooleanType => "BIT"
    case org.apache.spark.sql.types.TimestampType => "DATETIME2"
    case org.apache.spark.sql.types.DateType => "DATE"
    case d: org.apache.spark.sql.types.DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case org.apache.spark.sql.types.StringType =>
      // ≅ varchar length rules (core/loaders/sqlserver.py:185-204):
      // no length metadata in Spark → NVARCHAR(MAX)
      "NVARCHAR(MAX)"
    case other => s"NVARCHAR(MAX) /* ${other.simpleString} */"
  }

  /** CREATE TABLE statement from a schema (≅ generate_create_table,
    * core/loaders/sqlserver.py:128-239).
    */
  def createTableSql(table: String, schema: StructType): String = {
    val cols = schema.fields.map { f =>
      val nn = if (f.nullable) "NULL" else "NOT NULL"
      s"[${f.name}] ${ddlType(f)} $nn"
    }.mkString(",\n  ")
    s"CREATE TABLE [$table] (\n  $cols\n)"
  }
}
