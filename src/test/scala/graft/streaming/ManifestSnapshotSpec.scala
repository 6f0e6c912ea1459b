package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The object-store-safe CDC sink: write-once gen dirs + write-once
  * manifests, commit = the manifest's END line. These tests pin the
  * protocol invariants the scaladoc promises — merge semantics equal to
  * the bucketed rename sink, untouched buckets never rewritten, partial
  * manifests invisible, idempotent replay, vacuum keeps the referenced
  * window — all through the Hadoop FileSystem API.
  */
class ManifestSnapshotSpec extends SparkSpec {
  import spark.implicits._
  import graft.connect.Hfs
  import org.apache.hadoop.fs.Path

  private def snap(dir: String): Map[Long, (Long, String)] =
    StreamOps.readManifestSnapshot(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

  test("multi-batch merge: last version per key wins, across and within batches") {
    val dir = tmpDir("graft-manifest").toString
    val b1 = Seq((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c")).toDF("k", "v", "payload")
    StreamOps.mergeIntoManifestSnapshot(b1, "k", "v", dir, 8)
    // in-batch version resolution: k=2 appears twice, v=3 must win
    val b2 = Seq((2L, 2L, "stale"), (2L, 3L, "B"), (4L, 1L, "d")).toDF("k", "v", "payload")
    StreamOps.mergeIntoManifestSnapshot(b2, "k", "v", dir, 8)
    assert(snap(dir) == Map(
      1L -> ((1L, "a")), 2L -> ((3L, "B")), 3L -> ((1L, "c")), 4L -> ((1L, "d"))))
  }

  test("untouched buckets keep their old gen dirs (partition-pruned I/O)") {
    val dir = tmpDir("graft-manifest-prune").toString
    val n = 64
    val big = (1L to 200L).map(k => (k, 1L, s"p$k")).toDF("k", "v", "payload")
    StreamOps.mergeIntoManifestSnapshot(big, "k", "v", dir, n)
    val fs = Hfs.fs(spark, dir)
    val (v1, _, m1) = latest(fs, dir)
    // one key = one touched bucket
    StreamOps.mergeIntoManifestSnapshot(
      Seq((7L, 2L, "UPD")).toDF("k", "v", "payload"), "k", "v", dir, n)
    val (v2, _, m2) = latest(fs, dir)
    assert(v2 == v1 + 1)
    val changed = m2.filter { case (b, d) => m1.get(b).exists(_ != d) }
    assert(changed.size == 1, s"exactly one bucket should re-point: $changed")
    // every other bucket's entry is byte-identical: files never moved
    assert((m2 -- changed.keys) == (m1 -- changed.keys))
    assert(snap(dir)(7L) == ((2L, "UPD")))
  }

  test("a manifest without END is invisible; the previous version serves reads") {
    val dir = tmpDir("graft-manifest-partial").toString
    StreamOps.mergeIntoManifestSnapshot(
      Seq((1L, 1L, "a")).toDF("k", "v", "payload"), "k", "v", dir, 4)
    val fs = Hfs.fs(spark, dir)
    val (v1, _, _) = latest(fs, dir)
    // simulate a writer that died mid-commit: partial manifest, no END
    Hfs.writeSmall(fs, new Path(dir, s"manifests/m${v1 + 1}"),
      s"numBuckets\t4\n0\tdata/v${v1 + 1}/__bucket=0", overwrite = true)
    assert(snap(dir) == Map(1L -> ((1L, "a")))) // old snapshot intact
    // the replayed batch must overwrite the orphan and commit cleanly
    StreamOps.mergeIntoManifestSnapshot(
      Seq((2L, 1L, "b")).toDF("k", "v", "payload"), "k", "v", dir, 4)
    assert(snap(dir) == Map(1L -> ((1L, "a")), 2L -> ((1L, "b"))))
  }

  test("replaying the same batch is idempotent by key") {
    val dir = tmpDir("graft-manifest-replay").toString
    val b = Seq((1L, 5L, "x"), (2L, 5L, "y")).toDF("k", "v", "payload")
    StreamOps.mergeIntoManifestSnapshot(b, "k", "v", dir, 4)
    StreamOps.mergeIntoManifestSnapshot(b, "k", "v", dir, 4)
    assert(snap(dir) == Map(1L -> ((5L, "x")), 2L -> ((5L, "y"))))
  }

  test("changed numBuckets against an existing snapshot fails fast") {
    val dir = tmpDir("graft-manifest-guard").toString
    StreamOps.mergeIntoManifestSnapshot(
      Seq((1L, 1L, "a")).toDF("k", "v", "payload"), "k", "v", dir, 16)
    val e = intercept[IllegalArgumentException] {
      StreamOps.mergeIntoManifestSnapshot(
        Seq((2L, 1L, "b")).toDF("k", "v", "payload"), "k", "v", dir, 32)
    }
    assert(e.getMessage.contains("numBuckets=16"))
  }

  test("vacuum reclaims unreferenced gens, keeps the time-travel window") {
    val dir = tmpDir("graft-manifest-vacuum").toString
    // 4 commits all touching the same bucket -> 4 gens, only the last
    // referenced by the latest manifest
    (1 to 4).foreach { i =>
      StreamOps.mergeIntoManifestSnapshot(
        Seq((1L, i.toLong, s"v$i")).toDF("k", "v", "payload"), "k", "v", dir, 4)
    }
    val fs = Hfs.fs(spark, dir)
    assert(Hfs.listDirs(fs, new Path(dir, "data")).size == 4)
    val deleted = StreamOps.vacuumManifestSnapshot(spark, dir, keep = 2)
    assert(deleted == 2, s"expected the two oldest gens reclaimed, got $deleted")
    // reads still serve the latest state after vacuum
    assert(snap(dir) == Map(1L -> ((4L, "v4"))))
    // and only the kept manifests remain
    val manifests = fs.listStatus(new Path(dir, "manifests")).length
    assert(manifests == 2, s"expected 2 kept manifests, got $manifests")
  }

  test("a conflicting writer's clobber of the committed manifest is detected") {
    val dir = tmpDir("graft-manifest-clobber").toString
    StreamOps.mergeIntoManifestSnapshot(
      Seq((1L, 1L, "a")).toDF("k", "v", "payload"), "k", "v", dir, 4)
    val fs = Hfs.fs(spark, dir)
    val (v1, _, _) = latest(fs, dir)
    val body = Hfs.readSmall(fs, new Path(dir, s"manifests/m$v1"))
    // identical content re-verifies fine (the normal commit path)
    StreamOps.verifyCommit(fs, new Path(dir), v1, body)
    // simulate the race the scaladoc documents: another writer's PUT
    // landed on the same version AFTER ours — last-PUT-wins replaced
    // our manifest with one that no longer cites our buckets
    Hfs.writeSmall(fs, new Path(dir, s"manifests/m$v1"),
      "numBuckets\t4\n0\tdata/v9/__bucket=0\nEND", overwrite = true)
    val e = intercept[IllegalArgumentException] {
      StreamOps.verifyCommit(fs, new Path(dir), v1, body)
    }
    assert(e.getMessage.contains("clobbered"))
    // a vacuumed-away manifest (missing file) is the same loud failure
    intercept[IllegalArgumentException] {
      StreamOps.verifyCommit(fs, new Path(dir), v1 + 7, body)
    }
  }

  test("vacuum never deletes a gen above the newest complete manifest (in-flight commit)") {
    val dir = tmpDir("graft-manifest-inflight").toString
    (1 to 3).foreach { i =>
      StreamOps.mergeIntoManifestSnapshot(
        Seq((1L, i.toLong, s"v$i")).toDF("k", "v", "payload"), "k", "v", dir, 4)
    }
    val fs = Hfs.fs(spark, dir)
    val (vLatest, _, _) = latest(fs, dir)
    // simulate an in-flight writer: its gen dir exists (data written),
    // its manifest is not yet committed (or only partially PUT)
    val inflightGen = new Path(dir, s"data/v${vLatest + 1}")
    fs.mkdirs(inflightGen)
    Hfs.writeSmall(fs, new Path(dir, s"manifests/m${vLatest + 1}"),
      s"numBuckets\t4\n0\tdata/v${vLatest + 1}/__bucket=0", overwrite = true)
    StreamOps.vacuumManifestSnapshot(spark, dir, keep = 1)
    assert(fs.exists(inflightGen),
      "vacuum deleted an in-flight commit's gen dir — data loss under a racing writer")
    // the in-flight partial manifest is left for the writer's retry too
    assert(fs.exists(new Path(dir, s"manifests/m${vLatest + 1}")))
    // while committed state still reads fine
    assert(snap(dir) == Map(1L -> ((3L, "v3"))))
  }

  test("vacuum reclaims partial manifests below the kept window") {
    val dir = tmpDir("graft-manifest-partial-reclaim").toString
    (1 to 3).foreach { i =>
      StreamOps.mergeIntoManifestSnapshot(
        Seq((1L, i.toLong, s"v$i")).toDF("k", "v", "payload"), "k", "v", dir, 4)
    }
    val fs = Hfs.fs(spark, dir)
    // a crash-orphaned partial BELOW the kept window: overwrite the
    // oldest committed manifest with an END-less body
    Hfs.writeSmall(fs, new Path(dir, "manifests/m0"),
      "numBuckets\t4\n0\tdata/v0/__bucket=0", overwrite = true)
    StreamOps.vacuumManifestSnapshot(spark, dir, keep = 2)
    assert(!fs.exists(new Path(dir, "manifests/m0")),
      "partial manifest below the kept window must be reclaimed, not accumulate")
    // kept window intact
    assert(fs.exists(new Path(dir, "manifests/m1")))
    assert(fs.exists(new Path(dir, "manifests/m2")))
    assert(snap(dir) == Map(1L -> ((3L, "v3"))))
  }

  test("streaming end-to-end through foreachBatch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmpDir("graft-manifest-stream").toString
    val mem = MemoryStream[(Long, Long, String)]
    val q = StreamOps.upsertToParquetManifest(
      mem.toDF().toDF("k", "v", "payload"), "k", "v", dir, 8)
      .option("checkpointLocation", tmpDir("graft-manifest-ckpt").toString)
      .start()
    try {
      mem.addData(Seq((1L, 1L, "a"), (2L, 1L, "b")))
      q.processAllAvailable()
      mem.addData(Seq((2L, 2L, "B2"), (3L, 1L, "c")))
      q.processAllAvailable()
      assert(snap(dir) == Map(
        1L -> ((1L, "a")), 2L -> ((2L, "B2")), 3L -> ((1L, "c"))))
    } finally q.stop()
  }

  private def latest(fs: org.apache.hadoop.fs.FileSystem, dir: String) = {
    // mirror of the sink's resolution, via the public read path's deps
    val mdir = new Path(dir, "manifests")
    val versions = fs.listStatus(mdir).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("m"))
      .map(_.getPath.getName.drop(1).toLong).sorted(Ordering[Long].reverse)
    val v = versions.find { v =>
      Hfs.readSmall(fs, new Path(mdir, s"m$v")).split("\n").lastOption.contains("END")
    }.get
    val body = Hfs.readSmall(fs, new Path(mdir, s"m$v")).split("\n")
    val m = body.filter(l => l.nonEmpty && l != "END" && !l.startsWith("numBuckets"))
      .map { l => val Array(b, d) = l.split("\t", 2); b.toInt -> d }.toMap
    (v, 0, m)
  }
}
