package graft.tools

import graft.{CacheScope, Tables}
import graft.ops.{Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measured answer to "the hybrid row's dense side is brute force —
  * what does the ANN-backed deployment shape cost, and does it change
  * the fused answer?": runs the SAME RRF fusion (top-20 per side,
  * 1/(60+r) fixed-point) with the dense list produced two ways —
  *
  *  A. brute exact bridged cosine (the `q_text_hybrid_rrf` gate shape:
  *     exact by construction, one full-corpus pass per batch), and
  *  B. the frozen IVF-PQ probe (train → index → probe at the catalog
  *     operating point, topK = 20, self kept to match A) — the
  *     serving path whose per-batch cost is list-pruned, not
  *     corpus-sized.
  *
  * Reports min-of-N wall per variant (dense list + fusion, lexical
  * side shared and prebuilt — the comparison isolates the dense side)
  * and the agreement of the FUSED top-5: per-query Jaccard and top-1
  * match rate. ANN recall < 1 can legitimately shift tail ranks; the
  * probe quantifies by how much on this fixture rather than asserting.
  *
  * Usage: HybridProbe [iters=3]  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
  */
object HybridProbe {
  def main(args: Array[String]): Unit = {
    val iters = if (args.length > 0) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
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
    val queryPred = col("vec_id") % 97 === 3 && col("vec_id") < 100000

    // shared lexical side: bm25 top-20 for the batch ids, materialized
    // once (the comparison is about the dense side)
    val docs = Tables.t(spark, sfDir, "documents")
    val qdocs = docs.join(
      broadcast(emb.filter(queryPred).select(col("vec_id").as("doc_id"))),
      Seq("doc_id"))
    val lex = TextAnalysis.bm25TopKOn(docs, qdocs, 20)
      .select(col("query_id"), col("doc_id"), col("rank").as("lex_rank"))
      .persist()
    lex.count()

    def fuse(dense: DataFrame): DataFrame = {
      val fused = lex.join(dense, Seq("query_id", "doc_id"), "full_outer")
        .select(col("query_id"), col("doc_id"),
          (coalesce(round(lit(1e6) / (lit(60L) + col("lex_rank"))).cast("long"), lit(0L)) +
            coalesce(round(lit(1e6) / (lit(60L) + col("vec_rank"))).cast("long"), lit(0L))).as("s6"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("s6").desc, col("doc_id").asc)
      fused.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("doc_id"))
    }

    def bruteDense(): DataFrame = {
      val e = emb.select(col("vec_id"), Similarity.quantize1e4(col("embedding")).as("xq"))
        .withColumn("n2", Similarity.dot64(col("xq"), col("xq")))
      val qv = e.filter(queryPred)
        .select(col("vec_id").as("query_id"), col("xq").as("qx"), col("n2").as("qn2"))
      val cosd = e.crossJoin(broadcast(qv))
        .select(col("query_id"), col("vec_id").as("doc_id"),
          Similarity.cosineFromDots(Similarity.dot64(col("xq"), col("qx")),
            col("n2"), col("qn2")).as("cos"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("doc_id").asc)
      cosd.withColumn("vec_rank", row_number().over(w).cast("long"))
        .filter(col("vec_rank") <= 20)
        .select(col("query_id"), col("doc_id"), col("vec_rank"))
    }

    // frozen ANN artifacts: trained + saved in the GROUPED layout once
    // outside the timed loop (the q_sim_ivfpq_serve deployment shape —
    // directory pruning at the scan); the timed cost is the probe
    val model = Similarity.trainIvfPq(spark, emb)
    val idxPath = java.nio.file.Files.createTempDirectory("hybridprobe-idx").toString
    Similarity.saveIvfPqIndexGroupedAuto(
      Similarity.indexIvfPq(spark, emb, model), idxPath, Some(model.coarse.count()))
    val (index, width) = Similarity.loadIvfPqIndexLayout(spark, idxPath)

    def annDense(): DataFrame =
      Similarity.probeIvfPq(spark, emb, emb.filter(queryPred), model, index,
          excludeSelf = false, listsPerDir = width, topK = 20)
        .select(col("qid").as("query_id"), col("cid").as("doc_id"),
          col("rank").as("vec_rank"))

    def time(mk: () => DataFrame): (Double, Array[(Long, Long, Long)]) = {
      var out: Array[(Long, Long, Long)] = null
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        out = fuse(mk()).as[(Long, Int, Long)].collect()
          .map(r => (r._1, r._2.toLong, r._3))
        val dt = (System.nanoTime() - t0) / 1e9
        CacheScope.drain()
        dt
      }
      (ts.min, out)
    }

    val (tBrute, topBrute) = time(bruteDense _)
    val (tAnn, topAnn) = time(annDense _)

    val byQ = (r: Array[(Long, Long, Long)]) =>
      r.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val bq = byQ(topBrute); val aq = byQ(topAnn)
    val qs = bq.keySet ++ aq.keySet
    val jac = qs.toSeq.map { q =>
      val a = bq.getOrElse(q, Set.empty); val b = aq.getOrElse(q, Set.empty)
      if (a.isEmpty && b.isEmpty) 1.0 else (a & b).size.toDouble / (a | b).size
    }
    val top1 = (r: Array[(Long, Long, Long)]) =>
      r.filter(_._2 == 1L).map(t => t._1 -> t._3).toMap
    val t1b = top1(topBrute); val t1a = top1(topAnn)
    val top1Match = qs.toSeq.count(q => t1b.get(q) == t1a.get(q)).toDouble / qs.size

    println(f"""{"sf_dir":"$sfDir","iters_min_of":$iters,"n_queries":${qs.size},""" +
      f""""t_fused_brute_s":$tBrute%.2f,"t_fused_ivfpq_s":$tAnn%.2f,""" +
      f""""fused_top5_jaccard_mean":${jac.sum / jac.size}%.4f,""" +
      f""""fused_top1_match":$top1Match%.4f}""")
    spark.stop()
  }
}
