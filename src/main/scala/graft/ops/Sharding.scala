package graft.ops

import graft.{CatalogEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic training-shard layout — the last step of a data
  * pipeline before a trainer consumes the corpus: a global,
  * seed-stable shuffle of documents into N equal-mass shards, so that
  * (a) every data-parallel reader streams one shard with no
  * coordination, (b) re-running the pipeline bit-reproduces the same
  * shard membership and intra-shard order, and (c) no shard is skewed
  * by source or length clustering (hash placement is oblivious to
  * both).
  *
  * Placement is `md5(seed:doc_id)` reduced to a bucket — the same
  * engine-portable hex-prefix bucketing the split/hash gates use, so
  * the assignment itself is differentially checkable against DuckDB.
  * The writer materializes the plan with ONE hash-partitioned
  * exchange (`repartition(N, shard)`) and an intra-partition sort —
  * no global sort, no driver involvement; at 100 TB this is the
  * minimum movement any sharding can do. A manifest records per-shard
  * row counts for the trainer's sanity check.
  */
object Sharding {

  /** Shard count for the gate row (a deployment passes its own). */
  private[graft] val numShards = 16

  /** Stable shard id in [0, n) from the md5 hex prefix of the doc id —
    * two hex chars = 256 uniform cells folded onto n shards (keep n a
    * divisor of 256 for exact uniformity of the fold; 16 here).
    */
  private[graft] def shardId(docId: org.apache.spark.sql.Column, n: Int) =
    pmod(conv(substring(md5(concat(lit("shard:"), docId.cast("string"))), 1, 2),
      16, 10).cast("long"), lit(n.toLong))

  /** Catalog gate: the shard PLAN — per-shard document count, token
    * mass, and id range. Differential against DuckDB recomputing the
    * same md5 placement; near-equal `n_docs`/`bytes` across shards IS
    * the balance property the writer relies on.
    */
  def shardPlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "documents")
      .select($"doc_id", $"n_chars", shardId($"doc_id", numShards).as("shard"))
      .groupBy($"shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("bytes"),
        min($"doc_id").as("min_doc"),
        max($"doc_id").as("max_doc"))
      .orderBy($"shard")
  }

  private def nib(hexColSql: String, i: Int) =
    s"(strpos('0123456789abcdef', $hexColSql[$i:$i]) - 1)"

  private val shardPlanSql = {
    val h = "substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 2)"
    s"""WITH d AS (
       |  SELECT doc_id, n_chars,
       |    (${nib(h, 1)} * 16 + ${nib(h, 2)}) % $numShards AS shard
       |  FROM documents)
       |SELECT shard, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS bytes,
       |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
       |FROM d GROUP BY shard ORDER BY shard""".stripMargin
  }

  /** Materialize the shard layout: one exchange hash-partitioned on the
    * shard id, documents sorted by `doc_id` inside each shard (stable
    * replay order for the trainer), hive-style `shard=K/` output dirs,
    * and a `_shards.json` manifest with per-shard row counts. Returns
    * the manifest as a DataFrame for inspection.
    */
  def writeTrainingShards(
      df: DataFrame, docId: String, outDir: String, n: Int): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val planned = df
      .withColumn("shard", shardId(col(docId), n))
      .repartition(n, col("shard"))
      .sortWithinPartitions(col(docId))
    planned.write.mode("overwrite").partitionBy("shard").parquet(outDir)
    val counts = s.read.parquet(outDir)
      .groupBy($"shard").agg(count(lit(1)).as("n_rows"))
      .orderBy($"shard")
    val manifest = counts.collect() // ≤ n rows — bounded driver traffic
      .map(r => s"""{"shard": ${r.get(0)}, "n_rows": ${r.getLong(1)}}""")
      .mkString("[\n", ",\n", "\n]")
    val fs = graft.connect.Hfs.fs(s, outDir)
    graft.connect.Hfs.writeSmall(fs,
      new org.apache.hadoop.fs.Path(outDir, "_shards.json"), manifest,
      overwrite = true)
    counts
  }

  /** Incremental append: hash placement is a pure function of the doc
    * id, so new documents land in their shard WITHOUT touching any
    * existing file — the property that lets a daily ingest extend a
    * 100 TB shard layout with work proportional to the increment, not
    * the corpus. Existing part-files are never rewritten (parquet
    * append adds files); the manifest is recomputed from the result.
    */
  def appendToShards(
      df: DataFrame, docId: String, outDir: String, n: Int): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.withColumn("shard", shardId(col(docId), n))
      .repartition(n, col("shard"))
      .sortWithinPartitions(col(docId))
      .write.mode("append").partitionBy("shard").parquet(outDir)
    val counts = s.read.parquet(outDir)
      .groupBy($"shard").agg(count(lit(1)).as("n_rows"))
      .orderBy($"shard")
    val manifest = counts.collect()
      .map(r => s"""{"shard": ${r.get(0)}, "n_rows": ${r.getLong(1)}}""")
      .mkString("[\n", ",\n", "\n]")
    val fs = graft.connect.Hfs.fs(s, outDir)
    graft.connect.Hfs.writeSmall(fs,
      new org.apache.hadoop.fs.Path(outDir, "_shards.json"), manifest,
      overwrite = true)
    counts
  }

  def entries: Seq[CatalogEntry] = Seq(
    CatalogEntry("q_shard_plan", shardPlan, Some(shardPlanSql)))
}
