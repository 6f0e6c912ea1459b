package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Confirms the heavy-hitters sizing contract at scale: run
  * `Aggregates.heavyHittersOn` at a given capacity and print each
  * language's head as one line, alongside the measured per-language
  * distinct-term count — diff the output against the exact oracle to
  * see where a capacity sits relative to the vocabulary (PLANS.md r11:
  * capacity 64 leaves the exact regime at 10× vocabulary ~600;
  * capacity 1024 restores exactness).
  *
  * Usage: HhCapacity <sfDir> [capacity=64] [k=5]
  */
object HhCapacity {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val capacity = if (args.length > 1) args(1).toInt else 64
    val k = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables.t(spark, sfDir, "documents")
    val vocab = docs
      .select($"lang", explode(split($"text", " ")).as("term"))
      .groupBy($"lang").agg(countDistinct($"term").as("nv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    graft.ops.Aggregates.heavyHittersOn(spark, docs, k, capacity)
      .collect().foreach { r =>
        val lang = r.getString(0)
        println(s"""HH lang=$lang vocab=${vocab(lang)} capacity=$capacity head=${r.getString(1)}""")
      }
    spark.stop()
  }
}
