package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Confirms the heavy-hitters sizing contract at scale: run
  * `Aggregates.heavyHittersOn` at a given capacity — or
  * `heavyHittersAutoSized` with capacity "auto" (r12) — and print each
  * language's head next to the EXACT head computed from a full
  * (lang, term) rollup, with a per-language `exact=` verdict. The r11
  * finding this instruments: capacity 64 leaves the exact regime at
  * 10× vocabulary ~600 and capacity 1024 restores it; the r12
  * auto-sizing must reach `exact=true` everywhere with NO hand-chosen
  * number.
  *
  * Usage: HhCapacity <sfDir> [capacity=64|auto] [k=5]
  */
object HhCapacity {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val capacity = if (args.length > 1) args(1) else "64"
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
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.t(spark, sfDir, "documents")
    val vocab = docs
      .select($"lang", explode(split($"text", " ")).as("term"))
      .groupBy($"lang").agg(countDistinct($"term").as("nv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact per-language head: full rollup + windowed top-k, the
    // ground truth the sketch is diffed against
    val w = Window.partitionBy($"lang").orderBy($"n".desc, $"term".asc)
    val exact = docs
      .select($"lang", explode(split($"text", " ")).as("term"))
      .groupBy($"lang", $"term").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w)).filter($"rk" <= k)
      .groupBy($"lang")
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct($"rk",
          concat($"term", lit(":"), $"n").as("s")))),
        p => p("s"))).as("head"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val (sketch, capUsed) =
      if (capacity == "auto")
        (graft.ops.Aggregates.heavyHittersAutoSized(spark, docs, k),
          graft.ops.Aggregates.heavyHittersAutoCapacity(spark, docs))
      else
        (graft.ops.Aggregates.heavyHittersOn(spark, docs, k, capacity.toInt),
          capacity.toInt)
    var allExact = true
    sketch.collect().foreach { r =>
      val lang = r.getString(0)
      val head = r.getString(1)
      val ok = head == exact(lang)
      allExact &&= ok
      println(s"HH lang=$lang vocab=${vocab(lang)} capacity=$capUsed exact=$ok head=$head")
    }
    println(s"""{"tool":"hh_capacity","sf":"$sfDir","capacity":$capUsed,"auto":${capacity == "auto"},"max_vocab":${vocab.values.max},"all_exact":$allExact}""")
    spark.stop()
  }
}
