package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // conf-variant boards (e.g. the round-14 runtime-bloom-filter
    // threshold experiment): SPARK_GRAFT_EXTRA_CONF="k=v;k=v" — unset
    // in the driver's runs, so the default board is untouched
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach {
      _.split(';').filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k.trim, v.trim)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup across the distinct machinery (scan+agg, windows,
    // band joins, codegen expressions, k-means) at the SMALLEST fixture:
    // in-JVM repeat timing (graft.tools.QueryBench) showed first
    // executions carry 2-10× of JIT + whole-stage-codegen compile cost,
    // which otherwise lands on whatever query iterates first. Warmup
    // data is sf0.001 so this costs a few seconds, untimed.
    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR",
      if (new java.io.File("/root/testdata/sf0.001").isDirectory) "/root/testdata/sf0.001"
      else sfDir) // fall back to the bench fixture itself — warmup must never silently vanish
    Seq("q1_pricing", "q_win_rank", "q_dedup_minhash", "q_dedup_jaccard",
      "q_dedup_simhash_hamming", "q_sim_ivf", "q_evt_session",
      // round-5 machinery: banded levenshtein, iterative CC, shingle
      // window, global ntile — warm their codegen too
      "q_dedup_editdist", "q_dedup_cc", "q_text_boilerplate", "q_feat_ntile").foreach { q =>
      try { SparkEntry.queries(q)(spark, warmupDir).count() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup query $q failed on $warmupDir: ${e.getMessage}")
      }
    }
    spark.sharedState.cacheManager.clearCache()
    // CALIBRATION SENTINELS (r14 verdict #3): fixture-independent,
    // pure-CPU/shuffle probes measured before and after the catalog
    // passes, so round-over-round board comparisons can be normalized
    // mechanically against box drift instead of adjudicated by
    // narrative (this host oscillates ~20% across ten-minute windows;
    // two identical back-to-back r14 boards measured 134.5 vs 111.2 s).
    // cpu: codegen'd hash+sum over a range — no IO, no shuffle.
    // shuffle: range -> hash-partition -> count — exercises the
    // exchange machinery at a fixed size.
    def sentinelCpu(): Double = {
      val t0 = System.nanoTime()
      // pmod bounds each term so the ANSI-mode sum can't overflow
      spark.range(0L, 200000000L, 1L, cpus.toInt)
        .selectExpr("sum(pmod(xxhash64(id), 1000000)) as h").collect()
      (System.nanoTime() - t0) / 1e9
    }
    def sentinelShuffle(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 20000000L, 1L, cpus.toInt)
        .selectExpr("pmod(xxhash64(id), 1000) as k")
        .groupBy("k").count().selectExpr("sum(count)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    // one untimed run each to absorb JIT/codegen, then min-of-2 timed
    sentinelCpu(); sentinelShuffle()
    val sentCpuPre = math.min(sentinelCpu(), sentinelCpu())
    val sentShufPre = math.min(sentinelShuffle(), sentinelShuffle())
    // INTERLEAVED min-of-3: run the whole catalog once, then again, then
    // again, and take each query's min across passes. Back-to-back
    // repeats of one query share any multi-minute noisy-neighbor burst
    // on this host (a round-5 board carried a contiguous ~20-query
    // window measuring 6-10x slow that min-of-2 back-to-back could not
    // suppress); interleaving separates a query's samples by a full
    // catalog pass (~tens of seconds), so a burst must span the entire
    // bench to poison a query's minimum.
    //
    // SENTINEL TRACK (r16 verdict #1): pre/post sentinels bracketing a
    // ~17-minute run cannot localize WHEN the environment loaded up —
    // r16's official record needed prose adjudication because 152/203
    // rows drifted and nothing in the JSON said which minutes were
    // loaded. Now the cpu/shuffle pair runs every `sentinelEvery` timed
    // rows (single-shot — the track wants temporal resolution, not
    // per-sample minima) and each query's min records WHICH track
    // segment produced it, so a drift window is machine-visible: a row
    // is trustworthy iff its segment's bracketing sentinels are quiet,
    // and a cross-round ratio can drop rows from loaded segments
    // mechanically instead of narratively.
    val sentinelEvery = 25
    val track = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    track += ((sentCpuPre, sentShufPre))
    val iters = 3
    val names = SparkEntry.queries.keys.toSeq
    val best = scala.collection.mutable.Map.empty[String, Double]
    val bestSeg = scala.collection.mutable.Map.empty[String, Int]
    var timed = 0
    for (_ <- 1 to iters; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val t = (System.nanoTime() - t0) / 1e9
      // each query is self-contained: drop its persisted intermediates
      // so 100 accumulated caches don't evict/slow later queries
      CacheScope.drain()
      spark.sharedState.cacheManager.clearCache()
      if (t < best.getOrElse(name, Double.MaxValue)) {
        best(name) = t
        bestSeg(name) = track.size - 1 // segment AFTER track sample i
      }
      timed += 1
      if (timed % sentinelEvery == 0) track += ((sentinelCpu(), sentinelShuffle()))
    }
    track += ((math.min(sentinelCpu(), sentinelCpu()),
      math.min(sentinelShuffle(), sentinelShuffle())))
    val sentCpuPost = track.last._1
    val sentShufPost = track.last._2
    val results = names.map(n => n -> best(n)).toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val segs = names.map(n => s"\"" + n + "\":" + bestSeg(n))
      .mkString("{", ",", "}")
    val trackJson = track.zipWithIndex
      .map { case ((c, sh), i) => f"""{"i":$i,"cpu":$c%.3f,"shuffle":$sh%.3f}""" }
      .mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val sent = f"""{"cpu_pre":$sentCpuPre%.3f,"cpu_post":$sentCpuPost%.3f,""" +
      f""""shuffle_pre":$sentShufPre%.3f,"shuffle_post":$sentShufPost%.3f}"""
    // provenance (r16 verdict #8): which HEAD and which fixtures made
    // this board — r16's three boards differ only by environment and
    // two commits, and nothing in the JSON could tell them apart.
    val gitHead = scala.util.Try {
      val p = java.lang.Runtime.getRuntime.exec(Array("git", "rev-parse", "HEAD"))
      val out = new String(p.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim
      if (p.waitFor() == 0 && out.nonEmpty) out else "unknown"
    }.getOrElse("unknown")
    val fixtureFp = scala.util.Try(
      graft.connect.Hfs.listingFingerprint(spark, sfDir)).getOrElse("unknown")
    val catalogMd = java.security.MessageDigest.getInstance("MD5")
    names.sorted.foreach(n => catalogMd.update(n.getBytes("UTF-8")))
    val catalogHash = catalogMd.digest().map("%02x".format(_)).mkString
    println(s"""{"metric":"total","value":$total,"unit":"sec","iters_min_of":$iters,"sentinels":$sent,"sentinel_every":$sentinelEvery,"sentinel_track":$trackJson,"query_seg":$segs,"git_head":"$gitHead","fixture_fingerprint":"$fixtureFp","catalog_hash":"$catalogHash","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
