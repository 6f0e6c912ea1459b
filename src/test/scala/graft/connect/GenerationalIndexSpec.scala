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

  test("migration intent round-trip: dash-padded fields, live swap in place, finish runs, replay idempotent") {
    val base = tmpDir("graft-gi-migrate").toString
    val fs = Hfs.fs(spark, base)
    // layout: folded gens 0,1 + live gen 2, one sub; staged fold tmp
    // and live tmp both present (the post-intent crash state)
    Seq("a/batch=0", "a/batch=1", "a/batch=2", "a/.compact-tmp",
      "a/.rebucket-live-tmp").foreach(d => fs.mkdirs(new Path(base, d)))
    val plan = migratePlan(Seq(0L, 1L, 2L))
    assert(plan == MigratePlan(-1L, Some(2L), Seq(0L, 1L)))
    writeMigrateIntent(fs, base, "_mig", plan, Some("16"))
    var finished = Vector.empty[Option[String]]
    recoverMigrate(fs, base, Seq("a"), "_mig", "spec") { (p, param) =>
      assert(p == plan); finished :+= param
    }
    assert(finished == Vector(Some("16")))
    val entries = fs.listStatus(new Path(base, "a")).map(_.getPath.getName).sorted
    assert(entries.toSeq == Seq("batch=-1", "batch=2"),
      s"migration left $entries")
    assert(!fs.exists(new Path(base, "_mig")))
    // replay of the completed migration is a no-op (marker gone)
    recoverMigrate(fs, base, Seq("a"), "_mig", "spec") { (_, _) =>
      finished :+= None
    }
    assert(finished.size == 1)
    // empty fold + no live + no param: every field dash-pads and
    // round-trips (the single-generation and all-negative edges)
    writeMigrateIntent(fs, base, "_mig2", MigratePlan(-2L, None, Seq.empty), None)
    var got: Option[(MigratePlan, Option[String])] = None
    recoverMigrate(fs, base, Seq("a"), "_mig2", "spec") { (p, param) =>
      got = Some((p, param))
    }
    assert(got.contains((MigratePlan(-2L, None, Seq.empty), None)))
  }

  test("a corrupt intent marker fails with the marker path and remedy, not a bare NumberFormatException") {
    val base = tmpDir("graft-gi-corrupt").toString
    val fs = Hfs.fs(spark, base)
    // out-of-band damage (the atomic rename write can't produce this)
    Hfs.writeSmall(fs, new Path(base, "_intent"), "", overwrite = true)
    val e = intercept[IllegalStateException] {
      recoverIntent(fs, base, Seq("a"), "_intent", "spec")
    }
    assert(e.getMessage.contains("_intent"))
    assert(e.getMessage.contains("pre-compaction state"))
  }

  test("property: random append/crash/replay/compact interleavings track a brute-force model, both commit modes") {
    // r17 verdict ask #7: the core's scaladoc is now the single copy of
    // the crash-window reasoning — this drives random interleavings of
    // append / crash-mid-append+replay / compact / crash-mid-compact
    // through BOTH commit modes against an in-memory model, so a
    // future edit to the fold/commit logic fails HERE instead of
    // downstream in a family's lifecycle spec. A "generation" is a
    // directory of row files (names = row identities); consolidation
    // is name-dedup union — the family-agnostic shape of every real
    // family's fold.
    for (mode <- Seq("admission", "intent"); seed <- 1 to 3) {
      val base = tmpDir(s"graft-gi-prop-$mode-$seed").toString
      val fs = Hfs.fs(spark, base)
      val sub = "docs"
      val marker = "_intent"
      val rnd = new scala.util.Random(1000 * seed + (if (mode == "intent") 1 else 0))
      var nextId = 0L
      var itemN = 0
      // the model: generation -> row set, mutated by the PURE rules the
      // scaladoc states (append replaces own gen; compact folds all but
      // the newest live gen into min(fold)-1 with dedup)
      val model = scala.collection.mutable.Map.empty[Long, Set[String]]

      def fsItems(b: Long): Set[String] = {
        val d = new Path(base, s"$sub/batch=$b")
        if (!fs.exists(d)) Set.empty
        else fs.listStatus(d).map(_.getPath.getName).toSet
      }
      def fsState(): Map[Long, Set[String]] =
        generations(fs, base, sub).map(g => g -> fsItems(g)).toMap
      def recoverIfIntent(): Unit =
        if (mode == "intent") recoverIntent(fs, base, Seq(sub), marker, "prop")
      def check(ctx: String): Unit = {
        // a reader recovers first — that IS the intent-mode contract
        recoverIfIntent()
        val st = fsState()
        assert(st.values.flatten.toSet == model.values.flatten.toSet,
          s"$mode/$seed $ctx: visible rows != model rows\nfs=$st\nmodel=$model")
        if (mode == "intent")
          // additive-stats discipline: post-recovery, no row is ever
          // visible twice (a duplicate would double-count)
          assert(st.values.map(_.size).sum == st.values.flatten.toSet.size,
            s"$mode/$seed $ctx: duplicate rows visible post-recovery\n$st")
        // the newest live generation is bit-exact — it is the only
        // replayable batch and replay-safety depends on its integrity
        st.keys.filter(_ >= 0).maxOption.foreach { lid =>
          assert(st(lid) == model.getOrElse(lid, Set.empty),
            s"$mode/$seed $ctx: live generation $lid diverged")
        }
      }
      def writeGen(id: Long, items: Seq[String], partial: Boolean): Unit = {
        val d = new Path(base, s"$sub/batch=$id")
        fs.mkdirs(d)
        val ws = if (partial) items.sorted.take(items.size / 2) else items
        ws.foreach(it => fs.create(new Path(d, it), true).close())
      }
      def append(crashFirst: Boolean): Unit = {
        recoverIfIntent() // family entry point
        val id = nextId; nextId += 1
        requireLiveBatchId(id, "prop-compactor")
        val items = (0 until (1 + rnd.nextInt(3)))
          .map { _ => itemN += 1; s"row-$itemN" }
        if (crashFirst) {
          // crash mid-write: a partial generation is on disk; the
          // stream's next move is ALWAYS the replay of this batch
          clearGeneration(fs, base, Seq(sub), id)
          writeGen(id, items, partial = true)
        }
        clearGeneration(fs, base, Seq(sub), id) // the replay discipline
        writeGen(id, items, partial = false)
        model(id) = items.toSet
      }
      def stagePlan(plan: FoldPlan): Unit = {
        val tmp = staging(fs, base, sub)
        fs.mkdirs(tmp)
        plan.fold.flatMap(fsItems).toSet[String]
          .foreach(it => fs.create(new Path(tmp, it), true).close())
      }
      def modelFold(plan: FoldPlan): Unit = {
        val folded = plan.fold.flatMap(b => model.remove(b).getOrElse(Set.empty)).toSet
        model(plan.gen) = model.getOrElse(plan.gen, Set.empty) ++ folded
      }
      def compact(crash: Option[String]): Unit = {
        recoverIfIntent() // family entry point
        foldPlan(generations(fs, base, sub)).foreach { plan =>
          stagePlan(plan)
          crash match {
            case Some("staged") => () // crash before the commit point:
            // stale temps are invisible; the old state stands
            case Some("mid") if mode == "admission" =>
              // crash between commitRenameFirst's rename and deletes:
              // duplicates across generations — admission-mode rent.
              // The model folds fully (the visible row SET is already
              // the post-compaction set; copies collapse in the union)
              Hfs.renameChecked(fs, new Path(base, s"$sub/.compact-tmp"),
                new Path(base, s"$sub/batch=${plan.gen}"), "prop")
              modelFold(plan)
            case Some("mid") =>
              // intent mode: commit the intent, crash mid-apply (a
              // random prefix of the fold deletes ran). Recovery at the
              // next entry replays to completion, so the model state is
              // the POST-compaction one from the intent onward.
              writeIntent(fs, base, marker, plan.gen, plan.fold)
              plan.fold.take(rnd.nextInt(plan.fold.size + 1))
                .foreach(b => clearGeneration(fs, base, Seq(sub), b))
              modelFold(plan)
            case _ =>
              if (mode == "admission")
                commitRenameFirst(fs, base, sub, plan.gen, plan.fold, "prop")
              else {
                writeIntent(fs, base, marker, plan.gen, plan.fold)
                applyIntent(fs, base, Seq(sub), marker, plan.gen, plan.fold, "prop")
              }
              modelFold(plan)
          }
        }
      }

      append(crashFirst = false) // a layout to work on
      check("init")
      for (step <- 1 to 40) {
        rnd.nextInt(10) match {
          case 0 | 1 | 2 | 3 => append(crashFirst = false)
          case 4 | 5 => append(crashFirst = true)
          case 6 => compact(None)
          case 7 => compact(Some("staged"))
          case 8 | 9 => compact(Some("mid"))
        }
        check(s"step $step")
      }
      // close every run with a clean compact: crash rent folds away and
      // the admission-mode duplicate copies disappear from the layout
      compact(None)
      compact(None) // a second pass folds the gen the first left live
      check("final")
      if (mode == "admission") {
        val st = fsState()
        // at most the two unfoldable generations can still hold copies
        // of the same row set; row IDENTITY is already pinned by check
        assert(st.size <= 2, s"admission/$seed final: layout did not converge: $st")
      }
    }
  }
}
