package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shard writer semantics: the materialized layout must match the
  * plan, balance across shards, and bit-reproduce on a re-run.
  */
class ShardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("written shards match the plan's per-shard counts and are balanced") {
    import spark.implicits._
    val out = tmpDir("shards").toString + "/t"
    val docs = graft.Tables.t(spark, dir, "documents")
    val manifest = Sharding.writeTrainingShards(docs, "doc_id", out, 16)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val plan = Sharding.shardPlan(spark, dir)
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1))).toMap
    assert(manifest == plan)
    assert(manifest.keySet == (0 until 16).toSet, "every shard populated")
    // hash placement: no shard above 2x the mean at 500 docs
    val mean = manifest.values.sum.toDouble / 16
    assert(manifest.values.forall(_ <= 2 * mean), manifest.toString)
  }

  test("incremental append extends shards without touching existing files") {
    import spark.implicits._
    val out = tmpDir("shards").toString + "/inc"
    val docs = graft.Tables.t(spark, dir, "documents")
    val first = docs.filter($"doc_id" < 250)
    val second = docs.filter($"doc_id" >= 250)
    Sharding.writeTrainingShards(first, "doc_id", out, 16)
    def files(): Map[String, Long] = {
      val base = new java.io.File(out)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(base).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.length()).toMap
    }
    val before = files()
    val manifest = Sharding.appendToShards(second, "doc_id", out, 16)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val after = files()
    // every pre-append file survives byte-identical; only new files added
    assert(before.toSet.subsetOf(after.toSet), "append rewrote existing files")
    assert(after.size > before.size)
    // combined layout = full corpus, placed exactly as a fresh build would
    val plan = Sharding.shardPlan(spark, dir)
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1))).toMap
    assert(manifest == plan)
  }

  test("shard assignment and intra-shard order are deterministic across runs") {
    import spark.implicits._
    val out1 = tmpDir("shards").toString + "/a"
    val out2 = tmpDir("shards").toString + "/b"
    val docs = graft.Tables.t(spark, dir, "documents")
    Sharding.writeTrainingShards(docs, "doc_id", out1, 16)
    Sharding.writeTrainingShards(docs, "doc_id", out2, 16)
    def snapshot(out: String) =
      spark.read.parquet(out).select($"shard", $"doc_id")
        .orderBy($"shard", $"doc_id").collect().toSeq
    assert(snapshot(out1) == snapshot(out2))
    // manifest file exists and parses as one entry per shard
    val fs = graft.connect.Hfs.fs(spark, out1)
    val m = graft.connect.Hfs.readSmall(fs,
      new org.apache.hadoop.fs.Path(out1, "_shards.json"))
    assert(m.linesIterator.count(_.contains("\"shard\"")) == 16)
  }
}
