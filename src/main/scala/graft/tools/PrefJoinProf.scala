package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage profile for the prefix join (round-13 tuning): forces each
  * stage of the q_dedup_prefix_join plan independently so the 100×
  * cost attributes to a stage instead of a guess.
  * Usage: PrefJoinProf (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
  */
object PrefJoinProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.CacheScope._
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }
    val tauMilli = 600L
    val docs = Tables.t(spark, sfDir, "documents")
    val sh = graft.ops.Dedup.withShingles(docs.select($"doc_id", $"text"), "sh")
      .select($"doc_id", explode($"sh").as("s")).persistScoped()
    timed("sh materialize")(sh.count())
    val sz = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val dfreq = sh.groupBy($"s").agg(count(lit(1)).as("df"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"df", $"s")
    val pref = sh.join(dfreq, Seq("s")).join(sz, Seq("doc_id"))
      .withColumn("rn", row_number().over(wDoc))
      .filter($"rn" <= expr(s"n - ((n * $tauMilli + 999) div 1000) + 1"))
      .select($"doc_id", $"s", $"n").persistScoped()
    timed("pref materialize")(pref.count())
    val cand = pref.as("a").join(pref.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          lit(1000L) * least(col("a.n"), col("b.n")) >=
            lit(tauMilli) * greatest(col("a.n"), col("b.n")))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct().persistScoped()
    timed("cand join+distinct")(println("  cands=" + cand.count()))
    val sets = sh.groupBy($"doc_id")
      .agg(sort_array(collect_list($"s")).as("ss"), count(lit(1)).as("n"))
      .persistScoped()
    timed("sets collect_list")(sets.count())
    val out = cand
      .join(sets.select($"doc_id".as("doc_a"), $"ss".as("sa"), $"n".as("na")), Seq("doc_a"))
      .join(sets.select($"doc_id".as("doc_b"), $"ss".as("sb"), $"n".as("nb")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect($"sa", $"sb")).cast("long"))
      .withColumn("uni", $"na" + $"nb" - $"inter")
      .filter(lit(1000L) * $"inter" >= lit(tauMilli) * $"uni")
    timed("verify")(println("  pairs=" + out.count()))
    graft.CacheScope.drain()
    spark.stop()
  }
}
