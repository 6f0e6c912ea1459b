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
    * `events.ts` has shipped in two fixture generations: originally
    * parquet TIMESTAMP(NANOS), which Spark 4 rejects
    * ([PARQUET_TYPE_ILLEGAL]) and must be read as raw nanos via the
    * legacy conf and converted with exact integer division (`div`, not
    * `/` — double division loses precision above 2^53 and epoch-nanos
    * are ~1.7e18); since 2026-08-13 plain TIMESTAMP(MICROS) without the
    * UTC flag, which Spark reads as TIMESTAMP_NTZ. Both are normalized
    * to the session-zone TimestampType every downstream operator (and
    * every oracle pair) was built against — with the session zone
    * pinned to UTC the NTZ→LTZ cast is value-preserving, so the two
    * fixture generations produce identical column values.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampType}
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType => // legacy nanos fixture (and ScaleUp copies of it)
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampType => raw
        case _ => // TIMESTAMP_NTZ (micros, no UTC flag)
          raw.withColumn("ts", col("ts").cast(TimestampType))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every fixture table as a temp view (for spark.sql paths). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
