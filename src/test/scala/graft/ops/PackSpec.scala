package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TextAnalysis.packChunks]] invariants the DuckDB oracle can't
  * express directly: packing must CONSERVE tokens (nothing dropped or
  * double-counted) and produce contiguous chunk ids per language — the
  * properties a downstream pre-training loader depends on.
  */
class PackSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("packing conserves per-language token totals") {
    val fromChunks = TextAnalysis.packChunks(spark, dir)
      .groupBy($"lang").agg(sum($"n_tokens").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fromDocs = graft.Tables.t(spark, dir, "documents")
      .select($"lang", size(split($"text", " ")).cast("long").as("tokens"))
      .groupBy($"lang").agg(sum($"tokens").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fromChunks == fromDocs)
  }

  test("chunk ids are contiguous from 0 within each language") {
    val rows = TextAnalysis.packChunks(spark, dir)
      .groupBy($"lang").agg(min($"chunk_id").as("lo"),
        max($"chunk_id").as("hi"), count(lit(1)).as("n")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == 0, s"${r.getString(0)}: first chunk != 0")
      assert(r.getLong(2) == r.getLong(3) - 1,
        s"${r.getString(0)}: ids not contiguous (max=${r.getLong(2)}, n=${r.getLong(3)})")
    }
  }
}
