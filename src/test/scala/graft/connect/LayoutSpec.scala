package graft.connect

import graft.SparkSpec
import graft.model.{ConnectionSpec, ExtractStep, LoadStep}
import org.apache.spark.sql.functions._

/** Source/sink format coverage (json/orc) and the data-layout scale
  * story: partitionBy writes + partition pruning visible in the scan.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("json and orc source/sink round-trips") {
    for (fmt <- Seq("json", "orc")) {
      val dir = tmpDir(s"graft-$fmt")
      val conn = ConnectionSpec("c", "c", fmt, Map("basePath" -> dir.toString))
      val df = Seq((1L, "x", 1.5), (2L, "y", 2.5)).toDF("id", "tag", "v")
      Sources.write(df, conn, LoadStep("w", 1, "c", path = Some("out"), mode = "replace"))
      val back = Sources.read(spark, conn, ExtractStep("r", 1, "c", path = Some("out")))
      assert(back.count() == 2, fmt)
      assert(back.select(sum($"v")).as[Double].head() == 4.0, fmt)
    }
  }

  test("z-order layout bounds both dimensions per file; linear layout scatters the second") {
    // 64×64 grid of (a, b) points: a linear a-sort clusters a perfectly
    // but leaves every file spanning b's whole range, so a selective
    // b-filter (or an (a,b) box) overlaps all files; the Morton layout
    // gives each file a small box in BOTH dims. Files touched = files
    // whose per-file [min,max] box intersects the query box — exactly
    // the min/max skipping decision a parquet reader makes.
    import org.apache.spark.sql.functions._
    val grid = spark.range(64L * 64)
      .select(($"id" % 64).as("a"), ($"id" / 64).cast("long").as("b"),
        $"id".as("payload"))
    val base = tmpDir("graft-zorder")
    val nFiles = 16
    val written = Sources.writeZOrdered(grid, "a", "b", s"$base/z", nFiles)
    assert(written == nFiles)
    grid.orderBy("a", "payload").repartitionByRange(nFiles, $"a", $"payload")
      .sortWithinPartitions("a", "payload")
      .write.mode("overwrite").parquet(s"$base/linear")
    def filesTouched(dir: String, aLo: Long, aHi: Long, bLo: Long, bHi: Long): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min($"a").as("alo"), max($"a").as("ahi"),
          min($"b").as("blo"), max($"b").as("bhi"))
        .filter($"ahi" >= aLo && $"alo" <= aHi && $"bhi" >= bLo && $"blo" <= bHi)
        .count()
    // an 8×8 box = 1/64 of the data volume
    val zTouched = filesTouched(s"$base/z", 8, 15, 8, 15)
    val linTouched = filesTouched(s"$base/linear", 8, 15, 8, 15)
    // linear: the box's a-range lives in ~2 of 16 a-sorted files, but a
    // query selective in b ONLY cannot skip anything:
    val zbTouched = filesTouched(s"$base/z", 0, 63, 8, 15)
    val linbTouched = filesTouched(s"$base/linear", 0, 63, 8, 15)
    info(s"files touched of $nFiles — box: z=$zTouched linear=$linTouched; " +
      s"b-slice: z=$zbTouched linear=$linbTouched")
    assert(zTouched < linbTouched && zbTouched < linbTouched,
      s"z box=$zTouched zb=$zbTouched lin box=$linTouched linb=$linbTouched")
    assert(linbTouched == nFiles) // linear layout cannot skip on b
    assert(zbTouched <= nFiles / 2, s"z-order should skip ≥half the files on a b-slice: $zbTouched")
    // and the layout is lossless
    assert(spark.read.parquet(s"$base/z").count() == 64L * 64)
  }

  test("z-order survives full-range int64 columns (xxhash64 domains)") {
    // the rank formula must not multiply (c - lo) by maxRank in int64:
    // for a hash-valued column spanning ~the whole long range that
    // overflows, which under Spark 4's default ANSI mode is a runtime
    // ArithmeticException mid-write (and silent clustering destruction
    // with ANSI off). Ranks are computed in double space instead.
    import org.apache.spark.sql.functions._
    val wide = spark.range(1024)
      .select(xxhash64($"id").as("a"), xxhash64($"id" + 7).as("b"),
        $"id".as("payload"))
    val base = tmpDir("graft-zorder-wide")
    val written = Sources.writeZOrdered(wide, "a", "b", s"$base/z", 8)
    assert(written == 8L)
    assert(spark.read.parquet(s"$base/z").count() == 1024L)
    // clustering still real: each file's a-range must be a strict
    // subset of the global range (a degenerate all-equal-rank write
    // would leave every file spanning ~the full domain)
    val spans = spark.read.parquet(s"$base/z")
      .groupBy(input_file_name())
      .agg((max($"a").cast("double") - min($"a").cast("double")).as("span"))
      .select(max($"span")).as[Double].head()
    val global = wide
      .select(max($"a").cast("double") - min($"a").cast("double")).as[Double].head()
    assert(spans < global, s"widest file a-span $spans should be < global $global")
  }

  test("partitioned parquet write prunes partitions at read") {
    val dir = tmpDir("graft-part")
    val df = (1 to 1000).map(i => (i.toLong, s"2024-0${i % 3 + 1}", i * 1.0))
      .toDF("id", "month", "v")
    df.write.mode("overwrite").partitionBy("month").parquet(s"$dir/t")
    val read = spark.read.parquet(s"$dir/t").filter($"month" === "2024-02")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("month"), s"expected partition pruning in:\n$plan")
    assert(read.count() == df.filter($"month" === "2024-02").count())
    // pruned scan must not read all three partition dirs
    val scanned = read.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(!scanned.contains("2024-01") || scanned.contains("PartitionFilters"))
  }
}
