package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table access (TESTDATA.md / FIXTURES.md).
  *
  * Tables are driver-generated parquet at `\$dir/<name>.parquet`. The
  * reference delegates all scans to an external RDBMS
  * (reference: core/extractors/sqlserver.py:46-55); here the scan is a
  * native Spark parquet read so Catalyst can push filters/projections
  * into the scan (`PushedFilters`/`ReadSchema` in explain).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one fixture table.
    *
    * `events.ts` is parquet TIMESTAMP(NANOS) which Spark 4 rejects
    * ([PARQUET_TYPE_ILLEGAL]); read it as raw nanos via the legacy conf
    * and convert with exact integer division (`div`, not `/` — double
    * division loses precision above 2^53 and epoch-nanos are ~1.7e18).
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every fixture table as a temp view (for spark.sql paths). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
