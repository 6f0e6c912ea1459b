package graft.connect

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** DDL generation + schema-prune rules ≅ core/loaders/sqlserver.py
  * :128-239 (SURVEY.md §5.2), and the FK-graph join suggestion (A5).
  */
class MetadataSpec extends AnyFunSuite {

  test("prunedTo drops source columns absent from the frame (loaders:173-175)") {
    val source = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("c", DoubleType)))
    val df = StructType(Seq(StructField("c", DoubleType), StructField("a", LongType)))
    assert(TargetSchema.prunedTo(source, df).fieldNames.toSeq == Seq("a", "c"))
  }

  test("ddl type mapping (loaders:223-230, BIGINT fidelity break kept)") {
    assert(TargetSchema.ddlType(StructField("x", LongType)) == "BIGINT")
    assert(TargetSchema.ddlType(StructField("x", IntegerType)) == "INT")
    assert(TargetSchema.ddlType(StructField("x", DoubleType)) == "FLOAT")
    assert(TargetSchema.ddlType(StructField("x", BooleanType)) == "BIT")
    assert(TargetSchema.ddlType(StructField("x", TimestampType)) == "DATETIME2")
    assert(TargetSchema.ddlType(StructField("x", DecimalType(12, 3))) == "DECIMAL(12,3)")
    assert(TargetSchema.ddlType(StructField("x", StringType)) == "NVARCHAR(MAX)")
  }

  test("create table statement shape") {
    val ddl = TargetSchema.createTableSql("t",
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("name", StringType, nullable = true))))
    assert(ddl ==
      "CREATE TABLE [t] (\n  [id] BIGINT NOT NULL,\n  [name] NVARCHAR(MAX) NULL\n)")
  }

  test("fk graph suggests join columns in either direction") {
    val svc = new MetadataService(null)
    assert(svc.suggestJoin("lineitem", "orders").contains(("l_orderkey", "o_orderkey")))
    assert(svc.suggestJoin("orders", "lineitem").contains(("o_orderkey", "l_orderkey")))
    assert(svc.suggestJoin("region", "part").isEmpty)
  }

  test("schemaDiff reports added, removed, retyped, and nullability changes") {
    val svc = new MetadataService(null)
    val before = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType),
      StructField("qty", IntegerType),
      StructField("price", DoubleType)))
    val after = StructType(Seq(
      StructField("id", LongType), // NOT NULL loosened -> retyped
      StructField("name", StringType), // unchanged
      StructField("qty", LongType), // widened -> retyped
      StructField("added_at", TimestampType))) // new
    val diff = svc.schemaDiff(before, after)
    assert(diff == Seq(
      ("price", "removed", "double", ""),
      ("added_at", "added", "", "timestamp"),
      ("id", "retyped", "bigint not null", "bigint"),
      ("qty", "retyped", "int", "bigint")))
  }

  test("schemaDiff is empty for identical schemas") {
    val svc = new MetadataService(null)
    val s = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    assert(svc.schemaDiff(s, s).isEmpty)
  }
}
