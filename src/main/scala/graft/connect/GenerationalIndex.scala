package graft.connect

import org.apache.hadoop.fs.{FileSystem, Path}

/** The shared generational-layout core behind every incremental index
  * artifact in the engine — the exact dedup admission index
  * ([[graft.ops.Dedup.admitExactDedup]]), the semantic dedup admission
  * index ([[graft.ops.Similarity.admitSemanticDedup]]), and the BM25
  * inverted index ([[graft.ops.TextAnalysis.maintainBm25Index]]).
  * Before round 17 each family hand-rolled this machinery — four
  * near-copies of subtle crash-window reasoning; this object is the
  * single place the reasoning lives, and the per-family code keeps
  * only what is genuinely family-specific (what a generation CONTAINS
  * and how its rows consolidate).
  *
  * The lifecycle every family shares:
  *
  *  - appends land in `path/<sub>/batch=<id>` generation directories,
  *    one per (streaming) batch id — the REPLAY unit: a batch replayed
  *    after a partial failure first deletes its own generation
  *    ([[clearGeneration]]) and recomputes, so its prior rows can
  *    neither flag the replay (self-rejection = silent data loss) nor
  *    survive as duplicates (double-count);
  *  - non-negative ids are live appends, negative ids are compacted
  *    generations ([[requireLiveBatchId]]) — so a compaction output
  *    can never collide with a replayed batch id;
  *  - compaction folds every generation EXCEPT the newest live one
  *    into `gen = min(fold) − 1` ([[foldPlan]]). The newest
  *    non-negative batch stays untouched because it is the only one a
  *    restarted stream can replay, and replay safety is "delete your
  *    own generation, recompute" — which only works while ALL of that
  *    batch's rows still live in its own directory. Compactions run
  *    between drains (or from the scheduler), never concurrently with
  *    an active append;
  *  - the consolidated generation is staged in a dot-prefixed
  *    `.compact-tmp` directory ([[staging]]) that parquet readers
  *    never see, then committed.
  *
  * The COMMIT PROTOCOL is the one legitimate axis of divergence across
  * families, kept here as two explicit modes rather than divergent
  * copies:
  *
  *  - [[commitRenameFirst]] (admission mode): rename the staged
  *    generation into place, THEN delete the folded sources. A crash
  *    between the rename and the deletes leaves duplicate rows across
  *    generations — candidate-volume rent folded away by the next
  *    compaction. This mode is correct ONLY when a duplicate row flags
  *    exactly what the single row flags (admission candidates,
  *    admitted-vector rosters).
  *  - Intent mode ([[writeIntent]] → [[applyIntent]], recovery via
  *    [[recoverIntent]]): for ADDITIVE statistics (BM25 tf/df/N),
  *    where a duplicate row double-counts and corrupts every score —
  *    leftover-duplicates-until-next-compaction is NOT an acceptable
  *    window. The staged temps plus one small-file write-ahead intent
  *    make the delete-sources + rename sequence replayable: every
  *    family entry point calls [[recoverIntent]] first, so readers can
  *    never observe the double-counted middle of a compaction. A crash
  *    BEFORE the intent leaves the old state (stale temps are
  *    invisible garbage, cleared by [[staging]] next time); a crash
  *    after it replays deterministically to the new state.
  */
object GenerationalIndex {

  /** Generation ids present under `path/sub` — entries named
    * `batch=<id>`, whether directories (parquet generations) or files
    * (small-file stats subs): both list, so a family whose sub is
    * file-per-generation compacts the same way the directory families
    * do instead of silently seeing zero generations. */
  def generations(fs: FileSystem, path: String, sub: String): Seq[Long] = {
    val p = new Path(path, sub)
    val entries = if (fs.exists(p)) fs.listStatus(p).toSeq else Seq.empty
    entries.map(_.getPath.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
  }

  /** A compaction's shape: `fold` into `gen`, leave `live` untouched. */
  final case class FoldPlan(fold: Seq[Long], gen: Long, live: Option[Long])

  /** The fold plan over a family's generation ids, or None when fewer
    * than two directories would fold (nothing worth doing). */
  def foldPlan(all: Seq[Long]): Option[FoldPlan] = {
    val live = all.filter(_ >= 0).sorted.lastOption
    val fold = all.filterNot(live.contains).sorted
    if (fold.size < 2) None
    else Some(FoldPlan(fold, math.min(fold.min, 0L) - 1L, live))
  }

  /** Loud guard on append ids: negative generations belong to the
    * named compactor, never to a live batch. */
  def requireLiveBatchId(batchId: Long, compactor: String): Unit =
    require(batchId >= 0,
      s"batchId must be non-negative (got $batchId) — negative ids are " +
        s"reserved for $compactor generations")

  /** Idempotent-replay step, run BEFORE anything reads the index:
    * delete this batch's own generation under each sub, so a replay
    * recomputes the same result instead of seeing its own orphans. */
  def clearGeneration(fs: FileSystem, path: String, subs: Seq[String],
      batchId: Long): Unit =
    subs.foreach(sub => Hfs.deleteIfExists(fs,
      new Path(path, s"$sub/batch=$batchId")))

  /** `sub`'s staging location, cleared of any stale prior attempt —
    * dot-prefixed, so readers never see a half-written consolidation. */
  def staging(fs: FileSystem, path: String, sub: String): Path = {
    val tmp = new Path(path, s"$sub/.compact-tmp")
    Hfs.deleteIfExists(fs, tmp)
    tmp
  }

  /** Admission-mode commit for one sub: rename the staged generation
    * into place, then delete the folded sources (see the class doc for
    * when the crash window is acceptable). */
  def commitRenameFirst(fs: FileSystem, path: String, sub: String,
      gen: Long, srcIds: Seq[Long], what: String): Unit = {
    Hfs.renameChecked(fs, new Path(path, s"$sub/.compact-tmp"),
      new Path(path, s"$sub/batch=$gen"), what)
    srcIds.foreach(b => Hfs.deleteIfExists(fs,
      new Path(path, s"$sub/batch=$b")))
  }

  /** Intent-mode commit point: ONE small-file write recording
    * (generation, folded ids); everything after it is replayable. The
    * caller must have finished staging every sub's `.compact-tmp`.
    *
    * The marker is written to a dot-prefixed temp and RENAMED into
    * place: `fs.create` + write + close is not atomic, and a crash
    * mid-write would leave an empty/truncated marker that every later
    * entry point's [[recoverIntent]] trips over — or worse, a
    * truncated-but-parseable fold list that replays a PARTIAL fold
    * (sources deleted for only some of the staged generations =
    * exactly the double-count the intent exists to prevent). Rename is
    * the same atomic namespace primitive the rest of the protocol
    * already relies on, so the marker either exists complete or not
    * at all. */
  def writeIntent(fs: FileSystem, path: String, marker: String,
      gen: Long, fold: Seq[Long]): Unit =
    writeMarkerAtomic(fs, path, marker, s"$gen ${fold.mkString(",")}")

  /** The atomic small-file commit EVERY intent-style marker goes
    * through (shared by [[writeIntent]] and family-shaped intents like
    * the semantic-rebucket marker): stage to a dot-prefixed temp,
    * rename into place. Entry points recover (and delete) any pending
    * marker before committing a new one, so the target is absent in
    * every legal sequence; a leftover can only be an illegal
    * concurrent commit — renameChecked's existing-destination require
    * names it loudly. */
  def writeMarkerAtomic(fs: FileSystem, path: String, marker: String,
      content: String): Unit = {
    val tmp = new Path(path, s".$marker.tmp")
    Hfs.deleteIfExists(fs, tmp)
    Hfs.writeSmall(fs, tmp, content, overwrite = true)
    Hfs.renameChecked(fs, tmp, new Path(path, marker),
      s"intent-marker commit for $path")
  }

  /** The post-intent half — idempotent, so a crashed run replays to
    * the identical end state: folded sources deleted, staged temps
    * renamed to `batch=<gen>` (each skipped if a prior attempt already
    * moved it), intent dropped last. */
  def applyIntent(fs: FileSystem, path: String, subs: Seq[String],
      marker: String, gen: Long, fold: Seq[Long], what: String): Unit = {
    fold.foreach(b => clearGeneration(fs, path, subs, b))
    subs.foreach { sub =>
      val tmp = new Path(path, s"$sub/.compact-tmp")
      if (fs.exists(tmp))
        Hfs.renameChecked(fs, tmp, new Path(path, s"$sub/batch=$gen"),
          s"$what for $path/$sub")
    }
    Hfs.deleteIfExists(fs, new Path(path, marker))
  }

  /** A whole-layout MIGRATION's shape (the r18 rebucket verbs): fold
    * every generation except the newest live one into `gen`, and
    * re-stage the live generation IN PLACE under its own id — unlike
    * a compaction, a migration re-hashes/re-assigns every row, so the
    * live generation cannot stay untouched; keeping its batch id is
    * what preserves it as the stream's replay unit. */
  final case class MigratePlan(gen: Long, live: Option[Long], fold: Seq[Long])

  def migratePlan(all: Seq[Long]): MigratePlan = {
    val live = all.filter(_ >= 0).sorted.lastOption
    val fold = all.filterNot(live.contains)
    MigratePlan(math.min(fold.minOption.getOrElse(0L), 0L) - 1L, live, fold)
  }

  /** Migration-intent commit point: marker content
    * `<gen> <liveId|-> <foldCsv|-> <param|->` (dash placeholders keep
    * every field positional — no trailing-empty ambiguity), committed
    * atomically via [[writeMarkerAtomic]]. `param` carries the
    * family's migration parameter (a bucket modulus, a codebook
    * width) so the recovery can finish the family-specific swap. */
  def writeMigrateIntent(fs: FileSystem, path: String, marker: String,
      plan: MigratePlan, param: Option[String]): Unit =
    writeMarkerAtomic(fs, path, marker,
      s"${plan.gen} ${plan.live.getOrElse("-")} " +
        s"${if (plan.fold.isEmpty) "-" else plan.fold.mkString(",")} " +
        s"${param.getOrElse("-")}")

  /** The idempotent post-intent half EVERY migration shares: folded
    * sources deleted, each sub's consolidated `.compact-tmp` renamed
    * to `batch=<gen>`, each sub's `.rebucket-live-tmp` swapped in
    * place of the live generation, then the family's `finish` step
    * (codebook/stats/modulus-marker swaps — themselves idempotent by
    * contract), intent dropped last. Each rename is guarded by its
    * staged dir's existence, so a replay skips what a prior attempt
    * already moved. */
  def applyMigrate(fs: FileSystem, path: String, subs: Seq[String],
      marker: String, plan: MigratePlan, what: String)(finish: => Unit): Unit = {
    plan.fold.foreach(b => clearGeneration(fs, path, subs, b))
    subs.foreach { sub =>
      val foldTmp = new Path(path, s"$sub/.compact-tmp")
      if (fs.exists(foldTmp))
        Hfs.renameChecked(fs, foldTmp,
          new Path(path, s"$sub/batch=${plan.gen}"),
          s"$what folded commit for $path/$sub")
      plan.live.foreach { lid =>
        val liveTmp = new Path(path, s"$sub/.rebucket-live-tmp")
        if (fs.exists(liveTmp)) {
          Hfs.deleteIfExists(fs, new Path(path, s"$sub/batch=$lid"))
          Hfs.renameChecked(fs, liveTmp, new Path(path, s"$sub/batch=$lid"),
            s"$what live commit for $path/$sub")
        }
      }
    }
    finish
    Hfs.deleteIfExists(fs, new Path(path, marker))
  }

  /** Replay a crashed migration to completion if its intent exists
    * (one existence check otherwise). The family's `finish` receives
    * the parsed plan + param to rerun its swap steps idempotently.
    * Every family entry point calls this first: a migration's commit
    * deletes generations and swaps layout parameters, and a reader
    * that skipped recovery could prune with a stale parameter over the
    * migrated layout. */
  def recoverMigrate(fs: FileSystem, path: String, subs: Seq[String],
      marker: String, what: String)(
      finish: (MigratePlan, Option[String]) => Unit): Unit = {
    val m = new Path(path, marker)
    if (!fs.exists(m)) return
    val content = Hfs.readSmall(fs, m).trim
    val parsed = scala.util.Try {
      val parts = content.split(" ", -1)
      val live = if (parts(1) == "-") None else Some(parts(1).toLong)
      // length-guarded: writeMigrateIntent always emits 4 dash-padded
      // fields, but early-format markers may carry 2-3
      val fold = if (parts.length < 3 || parts(2) == "-" || parts(2).isEmpty)
        Seq.empty[Long]
        else parts(2).split(",").map(_.toLong).toSeq
      val param = if (parts.length < 4 || parts(3) == "-") None
        else Some(parts(3))
      (MigratePlan(parts(0).toLong, live, fold), param)
    }
    // unreachable via writeMigrateIntent (atomic rename) — a corrupt
    // marker is out-of-band damage and must name itself and the remedy
    val (plan, param) = parsed.getOrElse(throw new IllegalStateException(
      s"$what: corrupt migration intent marker $m (content: '$content'). " +
        "Expected '<gen> <liveId|-> <id,id,...|-> <param|->'. Inspect " +
        "the staged .compact-tmp / .rebucket-* dirs before deleting the " +
        "marker to fall back to the pre-migration state."))
    applyMigrate(fs, path, subs, marker, plan, what)(finish(plan, param))
  }

  /** Replay a crashed intent-mode compaction to completion if its
    * marker exists (no-op otherwise — one existence check). Every
    * intent-mode entry point calls this first. */
  def recoverIntent(fs: FileSystem, path: String, subs: Seq[String],
      marker: String, what: String): Unit = {
    val m = new Path(path, marker)
    if (!fs.exists(m)) return
    val content = Hfs.readSmall(fs, m).trim
    val parsed = scala.util.Try {
      val parts = content.split(" ")
      val fold = if (parts.length < 2 || parts(1).isEmpty) Seq.empty[Long]
        else parts(1).split(",").map(_.toLong).toSeq
      (parts(0).toLong, fold)
    }
    // unreachable via writeIntent (the marker commits by rename, so it
    // is complete or absent) — a corrupt marker means out-of-band
    // damage, and the failure must name the file and the safe remedy
    // instead of wedging every entry point on a bare NumberFormatException
    val (gen, fold) = parsed.getOrElse(throw new IllegalStateException(
      s"$what: corrupt compaction intent marker $m (content: " +
        s"'$content'). Expected '<gen> <id,id,...>'. The marker commits " +
        "atomically by rename, so this file was damaged out of band; " +
        "inspect the staged .compact-tmp dirs under each sub before " +
        "deleting the marker to fall back to the pre-compaction state."))
    applyIntent(fs, path, subs, marker, gen, fold, what)
  }
}
