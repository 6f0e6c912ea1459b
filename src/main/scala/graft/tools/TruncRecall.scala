package graft.tools

import graft.Tables
import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Truncated-dimension (Matryoshka-style) recall study: how much of
  * the neighbor structure does an embedding PREFIX carry? For each
  * d ∈ {8, 16, 32, 64}, stage 1 shortlists top-R candidates per query
  * by cosine over the FIRST d dims only, stage 2 rescores the
  * shortlist with the full 64 dims, and recall@3 is measured against
  * the full-dim brute-force ground truth. The serving question this
  * answers: can a prefix-truncated index (d·4 bytes/vector instead of
  * 256) drive candidate generation, with full vectors touched only
  * for R rows/query — the same two-stage shape as IVF-PQ, with
  * truncation instead of quantization as the compression.
  *
  * Caveat printed with the numbers: the synthetic fixture's embeddings
  * are near-isotropic with NO energy concentration in the prefix —
  * the WORST case for truncation (a Matryoshka-trained model
  * front-loads information; PCA-rotated embeddings concentrate energy
  * by construction). The isotropic numbers are the honest floor.
  *
  * Usage: TruncRecall [R=16]  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
  */
object TruncRecall {
  def main(args: Array[String]): Unit = {
    val shortlist = if (args.nonEmpty) args(0).toInt else 16
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
    graft.functions.GraftExtensions.register(spark)

    val e = Tables.t(spark, sfDir, "embeddings")
      .select($"vec_id", Similarity.quantize1e4($"embedding").as("xq"))
      .withColumn("n2", call_function("dot64", $"xq", $"xq"))
      .persist()
    val queries = e.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("qid"), $"xq".as("qxq"), $"n2".as("qn2"))

    def top3(scored: DataFrame): DataFrame = {
      val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id".asc)
      scored.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
        .select($"qid", $"vec_id")
    }
    // ground truth: full-dim brute force
    val truth = top3(queries.crossJoin(e.filter($"vec_id" % 50 =!= 0))
      .select($"qid", $"vec_id",
        Similarity.cosineFromDots(
          call_function("dot64", $"qxq", $"xq"), $"qn2", $"n2").as("cos")))
      .persist()
    val nTruth = truth.count()

    for (d <- Seq(8, 16, 32, 64)) {
      // prefix + its self-norm computed ONCE per row on each side —
      // inside the crossJoin they would be recomputed per PAIR
      val qd = queries.select($"qid",
        slice($"qxq", 1, d).as("pq"))
        .withColumn("pn2", call_function("dot64", $"pq", $"pq"))
      val ed = e.filter($"vec_id" % 50 =!= 0).select($"vec_id",
        slice($"xq", 1, d).as("pv"))
        .withColumn("vn2", call_function("dot64", $"pv", $"pv"))
      val stage1 = qd.crossJoin(ed)
        .select($"qid", $"vec_id",
          Similarity.cosineFromDots(
            call_function("dot64", $"pq", $"pv"), $"pn2", $"vn2").as("cos"))
      val w1 = Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id".asc)
      val cand = stage1.withColumn("rk", row_number().over(w1))
        .filter($"rk" <= shortlist).select($"qid", $"vec_id")
      val rescored = top3(cand
        .join(e.select($"vec_id", $"xq", $"n2"), Seq("vec_id"))
        .join(queries.select($"qid", $"qxq", $"qn2"), Seq("qid"))
        .select($"qid", $"vec_id",
          Similarity.cosineFromDots(
            call_function("dot64", $"qxq", $"xq"), $"qn2", $"n2").as("cos")))
      val hit = rescored.join(truth, Seq("qid", "vec_id"), "left_semi").count()
      println(f"""{"tool":"trunc_recall","dims":$d,"shortlist":$shortlist,"recall_at_3":${hit.toDouble / nTruth}%.3f,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
