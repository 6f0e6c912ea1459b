package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Gate-shape guard: the driver's correctness compare (pandas) sorts
  * result rows by every column before hashing and throws "unhashable
  * type: numpy.ndarray" on raw array/struct/map cells — a red driver
  * row no local test caught in round 6 (`q_emb_quantize`). This spec
  * fails at `sbt test` time, before any verify run, if a catalog query
  * ever emits a nested column: serialize arrays to csv strings
  * (`concat_ws` / DuckDB `array_to_string`) instead — the
  * `Aggregates.collectAgg` pattern.
  *
  * Schemas come from plan analysis only (no execution), so the full
  * 100+-query sweep is cheap.
  */
class SchemaGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("catalog names are unique — a duplicate would silently collapse in SparkEntry's map") {
    val names = Catalog.entries.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate catalog names: ${dups.mkString(", ")}")
    assert(names.size == Catalog.byName.size)
  }

  Catalog.entries.foreach { e =>
    test(s"${e.name}: output schema has no array/struct/map columns") {
      val schema = e.fn(spark, dir).schema
      spark.sharedState.cacheManager.clearCache()
      val nested = schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[StructType] ||
          f.dataType.isInstanceOf[MapType] => s"${f.name}: ${f.dataType.simpleString}"
      }
      assert(nested.isEmpty,
        s"driver cannot hash nested cells — serialize to string: ${nested.mkString(", ")}")
    }
  }
}
