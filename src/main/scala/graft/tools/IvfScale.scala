package graft.tools

import graft.Tables
import graft.ops.Similarity
import org.apache.spark.sql.SparkSession

/** Serving-cost isolation for the IVF-PQ scale question the 100×
  * probe raised (round 13): `q_sim_ivfpq`'s gate shape grows BOTH the
  * corpus and the query batch (`vec_id % 50`) with the fixture, and
  * pins k = [[Similarity.ivfPqK]] — so per-query candidates
  * (nprobe·N/k) and query count each scale with N and the row's total
  * ADC work is quadratic BY CONSTRUCTION. A deployment does neither:
  * the query batch is whatever arrives, and k scales ~√N (the
  * [[Similarity.ivfPq]] scaladoc's stated knob). This tool measures
  * exactly that split: train + index ONCE (frozen, reported
  * separately — the one-time cost), then time the probe for a FIXED
  * query batch at each requested k, so the number that comes out is
  * the per-batch serving cost a fleet pays and how the k knob moves
  * it.
  *
  * Usage: IvfScale <k1,k2,...> [queryEvery=500] [iters=3] [listsPerDir=0]
  *   (listsPerDir > 0 saves/probes the GROUPED index layout —
  *   saveIvfPqIndexGrouped — so the k-vs-directory-fanout trade the
  *   flat layout exposed can be measured against its fix)
  *   (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
  * Prints one JSON line per k: train/index seconds (once) + min/median
  * probe seconds over `iters` timed runs + result row count.
  */
object IvfScale {
  def main(args: Array[String]): Unit = {
    val ks = args(0).split(",").toSeq.map(_.toInt)
    val queryEvery = if (args.length > 1) args(1).toInt else 500
    val iters = if (args.length > 2) args(2).toInt else 3
    val listsPerDir = if (args.length > 3) args(3).toInt else 0
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

    val emb = Tables.t(spark, sfDir, "embeddings")
    val nVecs = emb.count()
    ks.foreach { k =>
      val base = java.nio.file.Files.createTempDirectory(s"ivfscale-k$k").toString
      val t0 = System.nanoTime()
      val model = Similarity.trainIvfPq(spark, emb, k = k)
      Similarity.saveIvfPqModel(model, s"$base/model")
      val tTrain = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val idx = Similarity.indexIvfPq(spark, emb, model)
      if (listsPerDir > 0) Similarity.saveIvfPqIndexGrouped(idx, s"$base/index", listsPerDir)
      else Similarity.saveIvfPqIndex(idx, s"$base/index")
      val tIndex = (System.nanoTime() - t1) / 1e9
      graft.CacheScope.drain()
      spark.sharedState.cacheManager.clearCache()
      val served = Similarity.loadIvfPqModel(spark, s"$base/model")
      val (index, layoutG) = Similarity.loadIvfPqIndexLayout(spark, s"$base/index")
      val queries = emb.filter($"vec_id" % queryEvery === 0)
      val nQ = queries.count()
      val times = (1 to iters).map { _ =>
        val t = System.nanoTime()
        val n = Similarity.probeIvfPq(spark, emb, queries, served, index,
          listsPerDir = layoutG).count()
        val dt = (System.nanoTime() - t) / 1e9
        graft.CacheScope.drain()
        spark.sharedState.cacheManager.clearCache()
        (dt, n)
      }
      val sorted = times.map(_._1).sorted
      println(f"""{"k":$k,"lists_per_dir":$listsPerDir,"n_vecs":$nVecs,"n_queries":$nQ,"t_train":$tTrain%.2f,"t_index":$tIndex%.2f,"t_probe_min":${sorted.head}%.2f,"t_probe_median":${sorted(iters / 2)}%.2f,"rows":${times.head._2},"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
