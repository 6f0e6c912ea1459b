package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Shard writer semantics: the materialized layout must match the
  * plan, balance across shards, and bit-reproduce on a re-run.
  */
class ShardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("written shards match the plan's per-shard counts and are balanced") {
    import spark.implicits._
    val out = tmpDir("shards").toString + "/t"
    val docs = graft.Tables.t(spark, dir, "documents")
    val manifest = Sharding.writeTrainingShards(docs, "doc_id", out, 16)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val plan = Sharding.shardPlan(spark, dir)
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1))).toMap
    assert(manifest == plan)
    assert(manifest.keySet == (0 until 16).toSet, "every shard populated")
    // hash placement: no shard above 2x the mean at 500 docs
    val mean = manifest.values.sum.toDouble / 16
    assert(manifest.values.forall(_ <= 2 * mean), manifest.toString)
  }

  test("incremental append extends shards without touching existing files") {
    import spark.implicits._
    val out = tmpDir("shards").toString + "/inc"
    val docs = graft.Tables.t(spark, dir, "documents")
    val first = docs.filter($"doc_id" < 250)
    val second = docs.filter($"doc_id" >= 250)
    Sharding.writeTrainingShards(first, "doc_id", out, 16)
    def files(): Map[String, Long] = {
      val base = new java.io.File(out)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(base).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.length()).toMap
    }
    val before = files()
    val manifest = Sharding.appendToShards(second, "doc_id", out, 16)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val after = files()
    // every pre-append file survives byte-identical; only new files added
    assert(before.toSet.subsetOf(after.toSet), "append rewrote existing files")
    assert(after.size > before.size)
    // combined layout = full corpus, placed exactly as a fresh build would
    val plan = Sharding.shardPlan(spark, dir)
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1))).toMap
    assert(manifest == plan)
  }

  test("compaction preserves the shard manifest (counts identical, append still incremental)") {
    import spark.implicits._
    val out = tmpDir("shards").toString + "/cmp"
    val docs = graft.Tables.t(spark, dir, "documents")
    // two writes → small files inside each shard dir, the compaction case
    Sharding.writeTrainingShards(docs.filter($"doc_id" < 250), "doc_id", out, 8)
    val manifest = Sharding.appendToShards(
        docs.filter($"doc_id" >= 250), "doc_id", out, 8)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val (rows, before, after) = graft.connect.Sources
      .compactPartitionedParquet(spark, out, "shard", 1000000L)
    assert(rows == 500L && after < before)
    // the rename-swap must carry the manifest over (r12 advice): a
    // dropped _shards.json silently demotes append/delete to the
    // legacy full-count path
    val mf = new java.io.File(out, "_shards.json")
    assert(mf.exists(), "_shards.json lost across compaction swap")
    // counts re-derived from the compacted files equal the pre-compaction ones
    val recounted = spark.read.parquet(out)
      .groupBy($"shard".cast("int").as("shard")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(recounted == manifest)
    // and a plant-sentinel append still merges ADDITIVELY off the manifest
    val text = new String(java.nio.file.Files.readAllBytes(mf.toPath), "UTF-8")
    assert(text.contains("\"shard\""), s"manifest malformed: $text")
  }

  test("shard assignment and intra-shard order are deterministic across runs") {
    import spark.implicits._
    val out1 = tmpDir("shards").toString + "/a"
    val out2 = tmpDir("shards").toString + "/b"
    val docs = graft.Tables.t(spark, dir, "documents")
    Sharding.writeTrainingShards(docs, "doc_id", out1, 16)
    Sharding.writeTrainingShards(docs, "doc_id", out2, 16)
    def snapshot(out: String) =
      spark.read.parquet(out).select($"shard", $"doc_id")
        .orderBy($"shard", $"doc_id").collect().toSeq
    assert(snapshot(out1) == snapshot(out2))
    // manifest file exists and parses as one entry per shard
    val fs = graft.connect.Hfs.fs(spark, out1)
    val m = graft.connect.Hfs.readSmall(fs,
      new org.apache.hadoop.fs.Path(out1, "_shards.json"))
    assert(m.linesIterator.count(_.contains("\"shard\"")) == 16)
  }

  test("doc_id order holds WITHIN each part-file (writer injects no re-sort)") {
    import spark.implicits._
    // The dynamic-partition writer requires input ordered by the
    // partition column; if we only sorted by doc_id, Spark would
    // inject Sort(shard) and drop our sort as redundant. Leading the
    // sortWithinPartitions with `shard` keeps doc_id order in every
    // file — assert it per physical file, with no re-sort on read.
    val out = tmpDir("shards").toString + "/order"
    val docs = graft.Tables.t(spark, dir, "documents")
    Sharding.writeTrainingShards(docs, "doc_id", out, 16)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    val parts = walk(new java.io.File(out))
      .filter(_.getName.endsWith(".parquet"))
    assert(parts.nonEmpty)
    parts.foreach { f =>
      val ids = spark.read.parquet(f.getAbsolutePath)
        .select($"doc_id").collect().map(_.getLong(0)).toSeq
      assert(ids == ids.sorted, s"unsorted doc_id in ${f.getName}")
    }
  }

  test("append merges the prior manifest additively (no corpus rescan)") {
    import spark.implicits._
    val out = tmpDir("shards").toString + "/merge"
    val docs = graft.Tables.t(spark, dir, "documents")
    Sharding.writeTrainingShards(docs.filter($"doc_id" < 100), "doc_id", out, 16)
    // Plant a sentinel in the prior manifest: if append RESCANNED the
    // corpus the sentinel would be overwritten by the true count; an
    // additive merge must carry it forward as (sentinel + increment).
    val fs = graft.connect.Hfs.fs(spark, out)
    val p = new org.apache.hadoop.fs.Path(out, "_shards.json")
    val prior = graft.connect.Hfs.readSmall(fs, p)
    val entry = """\{\s*"shard":\s*(\d+)\s*,\s*"n_rows":\s*(\d+)\s*\}""".r
    val priorCounts = entry.findAllMatchIn(prior)
      .map(m => m.group(1).toInt -> m.group(2).toLong).toMap
    val sentinel = priorCounts.map { case (k, v) =>
      k -> (if (k == 0) v + 1000L else v)
    }
    graft.connect.Hfs.writeSmall(fs, p,
      sentinel.toSeq.sortBy(_._1)
        .map { case (k, v) => s"""{"shard": $k, "n_rows": $v}""" }
        .mkString("[\n", ",\n", "\n]"),
      overwrite = true)
    val incr = docs.filter($"doc_id" >= 100 && $"doc_id" < 200)
    val incrCounts = incr
      .select(graft.ops.Sharding.shardId($"doc_id", 16).as("shard"))
      .groupBy($"shard").count()
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val merged = Sharding.appendToShards(incr, "doc_id", out, 16)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val expected = (sentinel.keySet ++ incrCounts.keySet).map { k =>
      k -> (sentinel.getOrElse(k, 0L) + incrCounts.getOrElse(k, 0L))
    }.toMap
    assert(merged == expected, "append did not merge prior manifest additively")
    assert(merged(0) >= 1000L, "sentinel lost — manifest was recomputed by rescan")
  }

  test("deleteFromShards: targeted rows gone, untouched shards byte-identical, manifest updated") {
    import spark.implicits._
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val out = tmpDir("shard-delete").toString + "/shards"
    Sharding.writeTrainingShards(docs, "doc_id", out, 16)
    val n0 = spark.read.parquet(out).count()
    // snapshot every part-file's (path, mtime, size) before deletion
    def snapshot(): Map[String, (Long, Long)] = {
      val fs = graft.connect.Hfs.fs(spark, out)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(out), true)
      val b = Map.newBuilder[String, (Long, Long)]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet"))
          b += f.getPath.toString -> ((f.getModificationTime, f.getLen))
      }
      b.result()
    }
    val before = snapshot()
    // delete 3 existing ids + 1 absent id (absent must be a no-op)
    val victims = Seq(3L, 57L, 220L)
    val req = (victims :+ 999999L).toDF("doc_id")
    val manifest = Sharding.deleteFromShards(req, "doc_id", out, 16)
    val after = spark.read.parquet(out)
    assert(after.count() == n0 - victims.length)
    assert(after.filter($"doc_id".isin(victims: _*)).count() == 0)
    // manifest agrees with the files exactly
    val fromFiles = after.groupBy($"shard".cast("int").as("shard"))
      .count().collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val fromManifest = manifest.collect()
      .map(r => (r.getInt(0), r.getLong(1))).filter(_._2 > 0).toMap
    assert(fromManifest == fromFiles)
    // shards not hosting a victim are untouched on disk
    val victimShards = victims
      .map(id => Sharding.shardIdOf(id, 16)).toSet
    val afterSnap = snapshot()
    val untouched = before.filter { case (p, _) =>
      !victimShards.exists(sh => p.contains(s"shard=$sh/"))
    }
    untouched.foreach { case (p, meta) =>
      assert(afterSnap.get(p).contains(meta), s"untouched file changed: $p")
    }
    // rewritten shards keep per-file doc_id order
    victimShards.foreach { sh =>
      spark.read.parquet(s"$out/shard=$sh")
        .select(org.apache.spark.sql.functions.input_file_name().as("f"), $"doc_id")
        .collect().groupBy(_.getString(0)).foreach { case (_, rows) =>
          val idsInFile = rows.map(_.getLong(1)).toSeq
          assert(idsInFile == idsInFile.sorted, s"file order broken in shard=$sh")
        }
    }
  }

  test("split-separated layout: one exchange, per-split standalone shard layouts, pruning-safe dirs") {
    import spark.implicits._
    val out = tmpDir("split-shards").toString + "/t"
    val docs = (1L to 300L).map(i =>
      (i, if (i % 10 == 0) "val" else "train", s"text $i")).toDF("doc_id", "split", "text")
    val manifest = Sharding.writeSplitShards(docs, "split", "doc_id", out, 8)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(manifest.map(_._3).sum == 300L)
    assert(manifest.map(_._1).toSet == Set("train", "val"))
    // physical separation: the split is a directory level, so an eval
    // reader can never touch a train row (and vice versa)
    val trainRows = spark.read.parquet(s"$out/split=train")
      .select($"doc_id").as[Long].collect().toSet
    val valRows = spark.read.parquet(s"$out/split=val")
      .select($"doc_id").as[Long].collect().toSet
    assert(valRows == (10L to 300L by 10L).toSet)
    assert(trainRows == (1L to 300L).toSet -- valRows)
    // every split dir is a standalone layout: its own manifest matches
    // the files, and the existing incremental tools work on it directly
    val m = spark.read.parquet(s"$out/split=train")
      .groupBy($"shard".cast("long")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val fromManifest = manifest.filter(_._1 == "train")
      .map(t => (t._2.toLong, t._3)).toMap
    assert(m == fromManifest)
    val extra = Seq((1001L, "new doc")).toDF("doc_id", "text")
    Sharding.appendToShards(extra, "doc_id", s"$out/split=train", 8)
    assert(spark.read.parquet(s"$out/split=train").count() == trainRows.size + 1)
  }

  test("shuffled training order: collocated epoch copies stop being byte-adjacent") {
    import spark.implicits._
    val base = tmpDir("order-shards").toString
    val docs = (1L to 200L).map(i => (i, "A", 10L)).toDF("doc_id", "source", "toks")
    val w = Seq(("A", 3000L)).toDF("source", "epochs_permille")
    val mix = TextAnalysis.replicateByEpochs(docs, w)
      .withColumn("mix_key", Sharding.mixKey($"doc_id", $"rep"))
      .withColumn("order_key", Sharding.trainingOrderKey($"mix_key"))
    Sharding.writeTrainingShards(mix, "mix_key", s"$base/bykey", 4)
    Sharding.writeTrainingShards(mix, "mix_key", s"$base/shuffled", 4,
      orderCol = Some("order_key"))
    // adjacency in FILE order (the order a sequential trainer reads):
    // same-doc neighbors per shard file
    def adjacentSameDoc(dir: String): Int = {
      val files = new java.io.File(dir).listFiles.filter(_.isDirectory)
        .flatMap(_.listFiles).filter(_.getName.endsWith(".parquet"))
      files.map { f =>
        val ids = spark.read.parquet(f.getPath)
          .select($"doc_id").as[Long].collect()
        ids.sliding(2).count(p => p.length == 2 && p(0) == p(1))
      }.sum
    }
    val sorted = adjacentSameDoc(s"$base/bykey")
    val shuffled = adjacentSameDoc(s"$base/shuffled")
    // key order: EVERY collocated copy pair is adjacent (~2/16 of 200
    // docs land two copies in one shard); the salted-hash order breaks
    // nearly all of them
    assert(sorted >= 10, s"fixture should collocate some copies (got $sorted adjacent)")
    assert(shuffled * 4 <= sorted,
      s"shuffled order must break adjacency: $shuffled vs $sorted")
    // and the shuffled layout is still the same DATA with the same
    // placement (manifest equality)
    val a = spark.read.parquet(s"$base/bykey").select($"mix_key", $"shard".cast("long"))
      .as[(String, Long)].collect().toSet
    val b = spark.read.parquet(s"$base/shuffled").select($"mix_key", $"shard".cast("long"))
      .as[(String, Long)].collect().toSet
    assert(a == b)
  }

  test("epoch-mix sharding: copies spread across shards; doc deletion removes every copy via key expansion") {
    import spark.implicits._
    val out = tmpDir("mix-shards").toString + "/t"
    // every doc at exactly 3 epochs (w=3000, no fractional branch):
    // deterministic 3 copies each
    val docs = (1L to 200L).map(i => (i, "A", 10L)).toDF("doc_id", "source", "toks")
    val w = Seq(("A", 3000L)).toDF("source", "epochs_permille")
    val mix = TextAnalysis.replicateByEpochs(docs, w)
      .withColumn("mix_key", Sharding.mixKey($"doc_id", $"rep"))
    Sharding.writeTrainingShards(mix, "mix_key", out, 16)
    val written = spark.read.parquet(out)
      .select($"doc_id", $"rep", $"shard".cast("long")).as[(Long, Long, Long)]
      .collect()
    assert(written.length == 600)
    // the reason mix_key exists: copies of one doc do NOT collocate.
    // With bare-doc_id placement every group would have exactly one
    // distinct shard; under the composite key most docs spread.
    val spreads = written.groupBy(_._1).map { case (_, c) => c.map(_._3).toSet.size }
    assert(spreads.count(_ >= 2) > 150,
      s"copies should usually spread: ${spreads.groupBy(identity).view.mapValues(_.size).toMap}")
    // right-to-be-forgotten over the mix: expand doc 7 to its <=3
    // candidate keys, delete — all copies gone, everything else intact
    val del = Sharding.expandMixDeletion(
      Seq(7L).toDF("doc_id"), "doc_id", maxRep = 3)
    assert(del.as[String].collect().toSet == Set("7:1", "7:2", "7:3"))
    val manifest = Sharding.deleteFromShards(del, "mix_key", out, 16)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(manifest.values.sum == 597L)
    val after = spark.read.parquet(out)
      .select($"doc_id", $"rep").as[(Long, Long)].collect()
    assert(!after.exists(_._1 == 7L))
    assert(after.length == 597)
  }

  test("curriculum order: anneal phase reads LAST in every part-file, phases internally shuffled") {
    import spark.implicits._
    val out = tmpDir("curriculum-shards").toString + "/t"
    // 200 docs on a 10-value score grid (20 docs per score). Top 300‰
    // ties-inclusive: cum(9,8,7) = 60 = exactly 30 % → threshold 7.
    val docs = (1L to 200L).map(i => (i, i % 10)).toDF("doc_id", "score")
    val cur = Sharding.withCurriculumOrder(docs, "doc_id", "score", annealPermille = 300L)
    Sharding.writeTrainingShards(cur, "doc_id", out, 4, orderCol = Some("curriculum_key"))

    val expAnneal = (1L to 200L).filter(_ % 10 >= 7).toSet
    val written = spark.read.parquet(out)
      .select($"doc_id", $"phase").as[(Long, Long)].collect()
    assert(written.length == 200)
    assert(written.filter(_._2 == 1L).map(_._1).toSet == expAnneal)

    // the property the sort key buys: in FILE order (the order a
    // sequential trainer reads) every main-phase row precedes every
    // anneal row, and the main phase is not secretly doc_id-sorted
    val files = new java.io.File(out).listFiles.filter(_.isDirectory)
      .flatMap(_.listFiles).filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4)
    var shuffledSomewhere = false
    files.foreach { f =>
      val rows = spark.read.parquet(f.getPath)
        .select($"doc_id", $"phase").as[(Long, Long)].collect()
      val lastP0 = rows.lastIndexWhere(_._2 == 0L)
      val firstP1 = rows.indexWhere(_._2 == 1L)
      assert(firstP1 == -1 || lastP0 < firstP1,
        s"phase interleaving in ${f.getName}")
      val p0 = rows.filter(_._2 == 0L).map(_._1)
      if (p0.length >= 3 && p0.toSeq != p0.sorted.toSeq) shuffledSomewhere = true
    }
    assert(shuffledSomewhere, "main phase should be hash-shuffled, not id-sorted")
  }

  test("3-phase curriculum: warmup -> main -> anneal in file order, phase math exact") {
    import spark.implicits._
    val out = tmpDir("curriculum3-shards").toString + "/t"
    // 200 docs on a 10-value grid: cuts (400, 100) ties-inclusive →
    // anneal threshold 9 (cum 20 = 10 %), main threshold 6 (cum 80 = 40 %)
    val docs = (1L to 200L).map(i => (i, i % 10)).toDF("doc_id", "score")
    val cur = Sharding.withCurriculumPhases(docs, "doc_id", "score", Seq(400L, 100L))
    val byPhase = cur.select($"doc_id", $"phase").as[(Long, Long)]
      .collect().groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byPhase(2L) == (1L to 200L).filter(_ % 10 >= 9).toSet, "anneal = top 100‰")
    assert(byPhase(1L) == (1L to 200L).filter(i => i % 10 >= 6 && i % 10 < 9).toSet)
    assert(byPhase(0L) == (1L to 200L).filter(_ % 10 < 6).toSet)
    Sharding.writeTrainingShards(cur, "doc_id", out, 4, orderCol = Some("curriculum_key"))
    val files = new java.io.File(out).listFiles.filter(_.isDirectory)
      .flatMap(_.listFiles).filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4)
    files.foreach { f =>
      val phases = spark.read.parquet(f.getPath)
        .select($"phase").as[Long].collect()
      // a sequential read sees phases non-decreasing: 0…0 1…1 2…2
      assert(phases.zip(phases.tail).forall { case (a, b) => a <= b },
        s"phase interleaving in ${f.getName}: ${phases.mkString(",")}")
      assert(phases.toSet == Set(0L, 1L, 2L),
        s"every shard carries all three phases at this density: ${f.getName}")
    }
    // cuts must be strictly decreasing and bounded
    intercept[IllegalArgumentException](
      Sharding.withCurriculumPhases(docs, "doc_id", "score", Seq(100L, 400L)))
    intercept[IllegalArgumentException](
      Sharding.withCurriculumPhases(docs, "doc_id", "score", Seq.empty))
  }
}
