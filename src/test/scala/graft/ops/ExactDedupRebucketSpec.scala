package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact-admission bucket-modulus migration
  * (Dedup.rebucketExactDedupIndex). The contract: no admission
  * decision moves (row contents are untouched — only hive partition
  * values re-hash), later admissions behave exactly like an
  * un-migrated twin with the same history, the live generation
  * survives as a replay unit, and a crash after the intent replays to
  * the uninterrupted end state from the admit entry — a reader can
  * never prune with the old modulus over the new layout (which would
  * MISS candidate buckets: a silently admitted duplicate).
  */
class ExactDedupRebucketSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(47)
  private val pool = ('a' to 'z').map(c => s"w$c")
  private def doc(n: Int) =
    Seq.fill(n)(pool(rnd.nextInt(pool.size))).mkString(" ")
  // deterministic three-batch corpus with planted near-dups: built
  // once so every twin index sees the identical history
  private lazy val batches: Seq[Seq[(Long, String)]] = {
    val texts = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var id = 0L
    val bases = (0 until 12).map(_ => doc(20))
    bases.foreach { b => texts += ((id, b)); id += 1 }
    bases.take(4).foreach { b =>
      texts += ((id, b)); id += 1 // exact copy, later batch
      texts += ((id, b + " " + doc(1))); id += 1 // near copy
    }
    (0 until 6).foreach { _ => texts += ((id, doc(20))); id += 1 }
    texts.toSeq.grouped((texts.size + 2) / 3).toSeq
  }

  private def populated(name: String, buckets: Int): (String, Seq[Set[Long]]) = {
    val idx = tmpDir(name).resolve("i").toString
    Dedup.createExactDedupIndex(spark, idx,
      batches.head.toDF("doc_id", "text"), 700L, prefixBuckets = buckets)
    val per = batches.zipWithIndex.map { case (b, i) =>
      val adm = Dedup.admitExactDedup(b.toDF("doc_id", "text"), idx, i.toLong)
        .select($"doc_id").as[Long].collect().toSet
      graft.CacheScope.drain()
      adm
    }
    (idx, per)
  }

  private def docRows(idx: String): Set[(Long, Long, Long)] =
    spark.read.option("basePath", s"$idx/docs").parquet(s"$idx/docs")
      .select($"doc_id", $"n", $"batch".cast("long"))
      .as[(Long, Long, Long)].collect().toSet
  private def prefixRows(idx: String): Set[(Long, String)] =
    spark.read.option("basePath", s"$idx/prefix").parquet(s"$idx/prefix")
      .select($"doc_id", $"s").as[(Long, String)].collect().toSet
  private def bucketsOf(idx: String): Int =
    graft.connect.Hfs.readSmall(graft.connect.Hfs.fs(spark, idx),
      new org.apache.hadoop.fs.Path(idx, "_prefix_buckets")).trim.toInt

  test("rebucket re-hashes the layout, preserves every row, and later admissions match an un-migrated twin") {
    val (a, perA) = populated("dedup-rebucket-a", buckets = 5)
    val (b, perB) = populated("dedup-rebucket-b", buckets = 5)
    assert(perA == perB) // identical history on both twins
    val beforeDocs = docRows(a).map(r => (r._1, r._2)) // content, sans gen
    val beforePrefix = prefixRows(a)
    assert(Dedup.rebucketExactDedupIndex(spark, a, 16) == 3) // 2 folded + live
    graft.CacheScope.drain()
    assert(bucketsOf(a) == 16 && bucketsOf(b) == 5)
    // row CONTENT preserved; every partition value under the new hash
    assert(docRows(a).map(r => (r._1, r._2)) == beforeDocs)
    assert(prefixRows(a) == beforePrefix)
    for ((sub, key) <- Seq(("docs", col("doc_id")), ("prefix", col("s")))) {
      val part = if (sub == "docs") "dbucket" else "bucket"
      val bad = spark.read.option("basePath", s"$a/$sub")
        .parquet(s"$a/$sub")
        .filter(col(part).cast("long") =!= pmod(xxhash64(key), lit(16L))).count()
      assert(bad == 0L, s"$sub holds $bad rows outside their new-modulus bucket")
    }
    // generations: folded {0,1} -> one negative, live batch 2 in place
    val gens = graft.connect.Hfs.listDirs(graft.connect.Hfs.fs(spark, a),
      new org.apache.hadoop.fs.Path(a, "docs")).map(_.getName).sorted
    assert(gens == Seq("batch=-1", "batch=2"), s"generations: $gens")
    graft.CacheScope.drain()
    // a 4th batch (planted dup of an admitted doc + novel docs) must
    // make IDENTICAL decisions on the migrated and un-migrated twins
    val admittedDoc = batches.flatten.toMap.apply(perA.flatten.min)
    val b3 = Seq(900L -> admittedDoc, 901L -> doc(20), 902L -> doc(20))
    val admA = Dedup.admitExactDedup(b3.toDF("doc_id", "text"), a, 3L)
      .select($"doc_id").as[Long].collect().toSet
    graft.CacheScope.drain()
    val admB = Dedup.admitExactDedup(b3.toDF("doc_id", "text"), b, 3L)
      .select($"doc_id").as[Long].collect().toSet
    graft.CacheScope.drain()
    assert(admA == admB, s"migrated admits $admA != twin admits $admB")
    assert(!admA.contains(900L), "planted dup of an admitted doc must reject")
    assert(admA.contains(901L) && admA.contains(902L))
  }

  test("replaying the live batch after a rebucket is still idempotent") {
    val (idx, per) = populated("dedup-rebucket-replay", buckets = 5)
    Dedup.rebucketExactDedupIndex(spark, idx, 16)
    graft.CacheScope.drain()
    val lastId = (batches.size - 1).toLong
    val replay = Dedup.admitExactDedup(
      batches.last.toDF("doc_id", "text"), idx, lastId)
      .select($"doc_id").as[Long].collect().toSet
    graft.CacheScope.drain()
    assert(replay == per.last,
      s"live-batch replay admitted $replay, first run admitted ${per.last}")
  }

  test("a crash after the intent replays to the uninterrupted end state from the admit entry") {
    val (a, _) = populated("dedup-rebucket-crash-a", buckets = 5)
    Dedup.rebucketExactDedupIndex(spark, a, 16)
    graft.CacheScope.drain()
    // twin B: stage what its own rebucket would stage (the re-hash is
    // deterministic, so A's committed output is the staged content),
    // write the intent, STOP
    val (b, _) = populated("dedup-rebucket-crash-b", buckets = 5)
    val bfs = graft.connect.Hfs.fs(spark, b)
    for ((sub, part) <- Seq(("docs", "dbucket"), ("prefix", "bucket"))) {
      spark.read.option("basePath", s"$a/$sub").parquet(s"$a/$sub/batch=-1")
        .drop("batch").repartition(col(part))
        .write.mode("overwrite").partitionBy(part)
        .parquet(s"$b/$sub/.compact-tmp")
      spark.read.option("basePath", s"$a/$sub").parquet(s"$a/$sub/batch=2")
        .drop("batch").repartition(col(part))
        .write.mode("overwrite").partitionBy(part)
        .parquet(s"$b/$sub/.rebucket-live-tmp")
    }
    graft.connect.Hfs.writeSmall(bfs,
      new org.apache.hadoop.fs.Path(b, "_dedup_rebucket_intent"),
      "-1 2 0,1 16", overwrite = true)
    graft.CacheScope.drain()
    // the admit entry recovers first, then admits — a dup of an
    // ADMITTED doc must still reject (the migrated layout serves with
    // the migrated modulus, no missed buckets)
    val someAdmitted = spark.read.option("basePath", s"$a/docs")
      .parquet(s"$a/docs").select($"doc_id").as[Long].collect().min
    val dupText = batches.flatten.toMap.apply(someAdmitted)
    val adm = Dedup.admitExactDedup(
      Seq(950L -> dupText).toDF("doc_id", "text"), b, 3L)
      .select($"doc_id").as[Long].collect()
    graft.CacheScope.drain()
    assert(adm.isEmpty, "dup admitted through a half-migrated layout")
    assert(!bfs.exists(new org.apache.hadoop.fs.Path(b, "_dedup_rebucket_intent")))
    assert(bucketsOf(b) == 16)
    assert(docRows(b).map(r => (r._1, r._2)) == docRows(a).map(r => (r._1, r._2)))
    assert(prefixRows(b) == prefixRows(a))
  }

  test("rebucket_dedup_index transform + loud failure modes") {
    val (idx, _) = populated("dedup-rebucket-transform", buckets = 5)
    val registry = new graft.exec.TransformRegistry
    graft.exec.CurationTransforms.registerDedupIndexRebucket(
      registry, spark, idx, newBuckets = 8)
    val frame = Seq((1L, "x y z")).toDF("doc_id", "text")
    assert(registry("rebucket_dedup_index")(frame) eq frame)
    graft.CacheScope.drain()
    assert(bucketsOf(idx) == 8)
    val e1 = intercept[IllegalArgumentException] {
      Dedup.rebucketExactDedupIndex(spark,
        tmpDir("dedup-rebucket-noidx").toString, 8)
    }
    assert(e1.getMessage.contains("not a bucketed exact-dedup index"))
    val e2 = intercept[IllegalArgumentException] {
      Dedup.rebucketExactDedupIndex(spark, idx, -1)
    }
    assert(e2.getMessage.contains("positive"))
  }
}
