package graft.tools

import graft.Tables
import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Truncated-dimension (Matryoshka-style) recall study: how much of
  * the neighbor structure does an embedding PREFIX carry? For each
  * d in the sweep, stage 1 shortlists top-R candidates per query by
  * cosine over the first d dims only, stage 2 rescores the shortlist
  * with the full 64 dims, and recall@3 is measured against the
  * full-dim brute-force ground truth. The serving question this
  * answers: can a prefix-truncated index (d·4 bytes/vector instead of
  * 256) drive candidate generation, with full vectors touched only
  * for R rows/query — the same two-stage shape as IVF-PQ, with
  * truncation instead of quantization as the compression.
  *
  * Two representations (arg 2), the r12 composition study:
  *  - `raw`: the stored dimension order, d ∈ {8,16,32,64}. On the
  *    near-isotropic synthetic fixture no energy concentrates in the
  *    prefix — the honest WORST case for truncation.
  *  - `pca`: rotate every vector onto the top-16 integer principal
  *    components first ([[Similarity.pcaTopKOn]] — power iteration
  *    with deflation, trained on the corpus itself), then truncate
  *    the SCORE vector, d ∈ {4,8,16}. PCA orders dims by explained
  *    variance by construction, so this is precisely the "rotate,
  *    then keep the leading dims" preprocessing a truncation-serving
  *    deployment would run. Stage 2 and the ground truth still use
  *    the full original vectors — only candidate generation changes.
  *    Projection arithmetic is the exact pcaCore integer convention
  *    (quantize → center on the integer mean → coarsen ÷100), so the
  *    rotated representation is reproducible engine-to-engine.
  *
  * Usage: TruncRecall [R=16] [mode=raw|pca]
  *   (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
  */
object TruncRecall {
  def main(args: Array[String]): Unit = {
    val shortlist = if (args.nonEmpty) args(0).toInt else 16
    val mode = if (args.length > 1) args(1) else "raw"
    require(mode == "raw" || mode == "pca", s"mode must be raw|pca: $mode")
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

    val emb = Tables.t(spark, sfDir, "embeddings")
    val e = emb
      .select($"vec_id", Similarity.quantize1e4($"embedding").as("xq"))
      .withColumn("n2", call_function("dot64", $"xq", $"xq"))
      .persist()

    // stage-1 representation: the stored vector, or its projection
    // onto the top-16 principal components (integer scores, ordered
    // by component = descending explained variance)
    val stage1Vec: DataFrame = mode match {
      case "raw" => e.select($"vec_id", $"xq".as("rq"))
      case "pca" =>
        val comps = Similarity.pcaTopKOn(spark, emb, 16, 3)
        val e0 = emb.select($"vec_id",
            posexplode(Similarity.quantize1e4($"embedding")).as(Seq("dim0", "q")))
          .select($"vec_id", ($"dim0" + 1).cast("long").as("dim"), $"q")
        val stats = e0.groupBy($"dim").agg(sum($"q").as("sq"), count(lit(1)).as("n"))
        val cx = e0.join(broadcast(stats), Seq("dim"))
          .withColumn("c", expr(
            "q - (CASE WHEN sq < 0 THEN -1L ELSE 1L END) * (abs(sq) div n)"))
          .select($"vec_id", $"dim", expr(
            "(CASE WHEN c < 0 THEN -1L ELSE 1L END) * (abs(c) div 100)").as("x"))
        cx.join(broadcast(comps), Seq("dim"))
          .groupBy($"vec_id", $"component").agg(sum($"x" * $"v").as("s"))
          .groupBy($"vec_id")
          .agg(transform(array_sort(collect_list(struct($"component", $"s"))),
            p => p("s")).as("rq"))
    }
    val ev = stage1Vec.persist()
    ev.count()

    val queries = e.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("qid"), $"xq".as("qxq"), $"n2".as("qn2"))

    def top3(scored: DataFrame): DataFrame = {
      val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id".asc)
      scored.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
        .select($"qid", $"vec_id")
    }
    // ground truth: full-dim brute force over the ORIGINAL vectors
    val truth = top3(queries.crossJoin(e.filter($"vec_id" % 50 =!= 0))
      .select($"qid", $"vec_id",
        Similarity.cosineFromDots(
          call_function("dot64", $"qxq", $"xq"), $"qn2", $"n2").as("cos")))
      .persist()
    val nTruth = truth.count()

    val dims = if (mode == "pca") Seq(4, 8, 16) else Seq(8, 16, 32, 64)
    for (d <- dims) {
      // prefix + its self-norm computed ONCE per row on each side —
      // inside the crossJoin they would be recomputed per PAIR
      val qd = ev.filter($"vec_id" % 50 === 0)
        .select($"vec_id".as("qid"), slice($"rq", 1, d).as("pq"))
        .withColumn("pn2", call_function("dot64", $"pq", $"pq"))
      val ed = ev.filter($"vec_id" % 50 =!= 0).select($"vec_id",
        slice($"rq", 1, d).as("pv"))
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
      println(f"""{"tool":"trunc_recall","mode":"$mode","dims":$d,"shortlist":$shortlist,"recall_at_3":${hit.toDouble / nTruth}%.3f,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
