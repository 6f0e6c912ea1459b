package graft.tools

import graft.Tables
import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Served-artifact recall on the clustered study corpus: does the
  * deployment path (frozen PcaModel + frozen prefix index +
  * `probePrefixIndex`/`probeRotatedPrefixIndex`) reproduce the r12
  * truncation study's conclusion — rotation buys recall at the same
  * byte budget — on the realistic mixture-of-Gaussians fixture, not
  * just the spec's planted-rank corpus? For each (dims, shortlist)
  * operating point the tool probes BOTH frozen layouts and scores
  * recall@3 against the full-dim brute-force truth.
  *
  * Usage: ServedRecall [sfDir=localdata/clustered]
  *   (env: SPARK_GRAFT_CPUS)
  */
object ServedRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("localdata/clustered")
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

    val emb = Tables.t(spark, sfDir, "embeddings").persist()
    val queries = emb.filter($"vec_id" % 50 === 0)

    // full-dim exact truth (the study's ground-truth shape)
    val e = emb.select($"vec_id", Similarity.quantize1e4($"embedding").as("xq"))
      .withColumn("n2", call_function("dot64", $"xq", $"xq")).persist()
    val q = e.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("qid"), $"xq".as("qxq"), $"n2".as("qn2"))
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"cid".asc)
    val truth = broadcast(q).join(e, $"qid" =!= $"vec_id")
      .select($"qid", $"vec_id".as("cid"),
        Similarity.cosineFromDots(
          call_function("dot64", $"qxq", $"xq"), $"qn2", $"n2").as("cos"))
      .withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
      .select($"qid", $"cid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    require(truth.nonEmpty, "empty truth set")

    val model = Similarity.trainPcaModel(spark, emb, k = 16)
    graft.CacheScope.drain()

    def recall(df: DataFrame): Double = {
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & truth).size.toDouble / truth.size
    }

    for ((d, r) <- Seq((8, 16), (16, 16), (16, 64))) {
      val raw = recall(Similarity.probePrefixIndex(spark, emb, queries,
        Similarity.buildPrefixIndex(spark, emb, dims = d), dims = d, shortlist = r))
      graft.CacheScope.drain()
      val rot = recall(Similarity.probeRotatedPrefixIndex(spark, emb, queries,
        model, Similarity.buildRotatedPrefixIndex(spark, emb, model, dims = d),
        dims = d, shortlist = r))
      graft.CacheScope.drain()
      println(f"""{"tool":"served_recall","dims":$d,"shortlist":$r,"raw":$raw%.3f,"rotated":$rot%.3f,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
