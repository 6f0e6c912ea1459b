package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator of the engine's query surface (SURVEY.md §2).
  *
  * @param name   stable id, becomes the `SparkEntry.queries` key
  * @param fn     Spark implementation over the fixture dir
  * @param oracle equivalent DuckDB SQL over the same parquet tables, or
  *               None for ops whose semantics aren't SQL-expressible
  *               (sampling, approx sketches) → driver runs a weaker
  *               rows-only check
  */
final case class CatalogEntry(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** The full operator catalog. Each sub-object groups one SURVEY.md §2
  * family; `SparkEntry` derives its `queries`/`oracleSql` maps from here.
  */
object Catalog {
  def entries: Seq[CatalogEntry] =
    ops.Relational.entries ++
      ops.SqlSurface.entries ++
      ops.Joins.entries ++
      ops.SaltedJoin.entries ++
      ops.Aggregates.entries ++
      ops.Windows.entries ++
      ops.SetSortLimit.entries ++
      ops.Scalars.entries ++
      ops.EventOps.entries ++
      ops.FeatureOps.entries ++
      ops.Dedup.entries ++
      ops.Graph.entries ++
      ops.Similarity.entries ++
      ops.TextAnalysis.entries ++
      ops.Sharding.entries ++
      multimodal.Multimodal.entries

  lazy val byName: Map[String, CatalogEntry] =
    entries.map(e => e.name -> e).toMap
}
