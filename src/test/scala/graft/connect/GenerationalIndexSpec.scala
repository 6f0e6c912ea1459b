package graft.connect

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** Direct pins on the shared generational-index core. The three index
  * families pin the composed behavior (admission, compaction, WAL
  * replay, crash windows) through their own specs; these cases pin the
  * helper's PLANNING edge cases, which every family inherits and none
  * exercises exhaustively.
  */
class GenerationalIndexSpec extends SparkSpec {
  import GenerationalIndex._

  test("foldPlan: newest non-negative stays live, rest fold below the floor") {
    val p = foldPlan(Seq(0L, 1L, 2L)).get
    assert(p.live.contains(2L) && p.fold == Seq(0L, 1L) && p.gen == -1L)
    // compacted generations refold with live appends, floor descends
    val q = foldPlan(Seq(-1L, 2L, 3L)).get
    assert(q.live.contains(3L) && q.fold == Seq(-1L, 2L) && q.gen == -2L)
  }

  test("foldPlan: nothing to do below two foldable generations") {
    assert(foldPlan(Seq.empty).isEmpty)            // no layout yet
    assert(foldPlan(Seq(5L)).isEmpty)              // only the live batch
    assert(foldPlan(Seq(-1L, 5L)).isEmpty)         // compacted + live
    assert(foldPlan(Seq(-3L)).isEmpty)             // compacted only
  }

  test("foldPlan: all-negative layouts (post-compaction, no live append) still fold") {
    // two crash-window compacted generations and no live batch: they
    // fold together — there is no replayable batch to protect
    val p = foldPlan(Seq(-1L, -2L)).get
    assert(p.live.isEmpty && p.fold == Seq(-2L, -1L) && p.gen == -3L)
  }

  test("requireLiveBatchId names the compactor that owns negative ids") {
    requireLiveBatchId(0L, "compactX")
    val e = intercept[IllegalArgumentException](requireLiveBatchId(-1L, "compactX"))
    assert(e.getMessage.contains("compactX"))
  }

  test("intent round-trip: write, recover applies idempotently, empty fold list parses") {
    val base = tmpDir("graft-gi-intent").toString
    val fs = Hfs.fs(spark, base)
    // stage one sub, leave the other already-moved (prior attempt)
    fs.mkdirs(new Path(base, "a/.compact-tmp"))
    fs.mkdirs(new Path(base, "a/batch=0"))
    fs.mkdirs(new Path(base, "b/batch=0"))
    fs.mkdirs(new Path(base, "b/batch=-1")) // b's temp already renamed
    writeIntent(fs, base, "_intent", -1L, Seq(0L))
    recoverIntent(fs, base, Seq("a", "b"), "_intent", "spec")
    assert(fs.exists(new Path(base, "a/batch=-1")))
    assert(fs.exists(new Path(base, "b/batch=-1")))
    assert(!fs.exists(new Path(base, "a/batch=0")))
    assert(!fs.exists(new Path(base, "b/batch=0")))
    assert(!fs.exists(new Path(base, "_intent")))
    // replay of the completed intent is a no-op (marker gone)
    recoverIntent(fs, base, Seq("a", "b"), "_intent", "spec")
    assert(fs.exists(new Path(base, "a/batch=-1")))
    // an intent with an empty fold list (degenerate but writable)
    // parses and completes without touching generations
    writeIntent(fs, base, "_intent2", -2L, Seq.empty)
    recoverIntent(fs, base, Seq("a", "b"), "_intent2", "spec")
    assert(fs.exists(new Path(base, "a/batch=-1")))
    assert(!fs.exists(new Path(base, "_intent2")))
  }
}
