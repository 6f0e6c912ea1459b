package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded randomized invariants for the deterministic primitives the
  * gates lean on — property-style sweeps (fixed seeds, so failures
  * reproduce) over inputs the fixture-bound gates never vary.
  */
class InvariantSpec extends SparkSpec {
  import spark.implicits._

  test("shardId matches an independent JVM md5 reimplementation on 500 random ids") {
    // the differential gate checks shardId against DuckDB at fixture
    // ids; this pins it against a THIRD implementation across the id
    // space (huge ids, zero) so an md5/conv/pmod drift can't hide
    val rnd = new scala.util.Random(42)
    val ids = (Seq(0L, 1L, Long.MaxValue) ++
      Seq.fill(497)(math.abs(rnd.nextLong()))).distinct
    def jvmShard(id: Long, n: Int): Long = Sharding.shardIdOf(id, n)
    val got = ids.toDF("doc_id")
      .select($"doc_id", Sharding.shardId($"doc_id", 16).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      assert(got(id) == jvmShard(id, 16), s"shard mismatch for id $id")
    }
    // and every shard lands in range with all 16 shards populated
    assert(got.values.forall(s => s >= 0 && s < 16))
    assert(got.values.toSet.size == 16)
  }

  test("perceptron reaches 100% train accuracy on randomized separable corpora (3 seeds)") {
    for (seed <- Seq(7, 21, 99)) {
      val rnd = new scala.util.Random(seed)
      val posVocab = (0 until 20).map(i => s"p${seed}_$i")
      val negVocab = (0 until 20).map(i => s"n${seed}_$i")
      val shared = (0 until 10).map(i => s"s${seed}_$i")
      val rows = (0 until 80).map { i =>
        val pos = i % 2 == 0
        val vocab = if (pos) posVocab else negVocab
        val words = Seq.fill(6)(vocab(rnd.nextInt(vocab.size))) ++
          Seq.fill(3)(shared(rnd.nextInt(shared.size)))
        (i.toLong, words.mkString(" "), "en",
          if (pos) "cur" else "crawl", 30L)
      }
      val docs = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      val out = TextAnalysis.perceptronOn(spark, docs, Seq("cur"), rounds = 5)
        .collect()
      val correct = out.map(_.getAs[Long]("n_correct")).sum
      assert(correct == 80L, s"seed $seed: $correct/80 correct")
      graft.CacheScope.drain()
    }
  }

  test("PCA finds the planted axis wherever it is planted (3 random axes)") {
    for (seed <- Seq(3, 11, 31)) {
      val rnd = new scala.util.Random(seed)
      val d = 8
      val axis = rnd.nextInt(d)
      val rows = (0 until 150).map { i =>
        val big = if (i % 2 == 0) 1.0f else -1.0f
        (i.toLong, (0 until d).map { j =>
          if (j == axis) big else (rnd.nextInt(5) - 2) * 0.002f
        })
      }
      val out = Similarity.pcaPowerOn(spark, rows.toDF("vec_id", "embedding"), 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(math.abs(out(axis + 1L)) == 1000L,
        s"seed $seed axis $axis: component ${out(axis + 1L)}")
      (1 to d).filter(_ != axis + 1).foreach { j =>
        assert(math.abs(out(j.toLong)) < 200L,
          s"seed $seed: off-axis dim $j = ${out(j.toLong)}")
      }
      graft.CacheScope.drain()
    }
  }

  test("EWMA fold matches a JVM reimplementation on random sequences; repartition-invariant") {
    // the gate checks the array-fold vs DuckDB's recursive CTE on the
    // fixture; this pins both against a THIRD formulation (a plain
    // Scala foldLeft) on randomized per-user sequences, including
    // single-event users and a mid-stream zero
    val rnd = new scala.util.Random(7)
    val rows = (1 to 40).flatMap { u =>
      val n = 1 + rnd.nextInt(30)
      (1 to n).map { i =>
        (1000L * u + i, // event_id, unique, ordered within user
          java.sql.Timestamp.valueOf(f"2026-01-01 00:${i / 60}%02d:${i % 60}%02d"),
          u.toLong,
          if (rnd.nextInt(10) == 0) 0.0 else rnd.nextDouble() * 400.0)
      }
    }
    val df = rows.toDF("event_id", "ts", "user_id", "value")
    def expected(vs: Seq[Long]): Seq[Long] =
      vs.tail.scanLeft(vs.head)((s, v) => (7 * s + v) / 8)
    val exp = rows.groupBy(_._3).view.mapValues { es =>
      val ordered = es.sortBy(e => (e._2.getTime, e._1))
      val vs = ordered.map(e => math.floor(e._4 * 100).toLong)
      ordered.map(_._1).zip(expected(vs))
    }.toMap
    val got = EventOps.ewmaOf(df)
      .select($"user_id", $"event_id", $"ewma")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == rows.length)
    got.foreach { case (u, eid, s) =>
      val e = exp(u).find(_._1 == eid).get._2
      assert(s == e, s"user $u event $eid: got $s, expected $e")
    }
    // the fold is a pure function of each user's ORDERED history —
    // input partitioning must not matter
    val got13 = EventOps.ewmaOf(df.repartition(13))
      .select($"user_id", $"event_id", $"ewma")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got13.sorted.toSeq == got.sorted.toSeq)

    // maxHistory is a loud RUNTIME guard, not advice: an entity past
    // the cap fails the job with a message naming the streaming twin,
    // and entities AT the cap still compute (boundary inclusive)
    val hot = (1 to 5).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2026-01-01 00:00:$i%02d"),
        99L, 10.0)
    }.toDF("event_id", "ts", "user_id", "value")
    val err = intercept[Exception] {
      EventOps.ewmaOf(hot, maxHistory = 4).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(m =>
        m.contains("maxHistory=4") && m.contains("statefulEwma")),
      s"guard error should name the cap and the streaming twin: ${msgs(err)}")
    assert(EventOps.ewmaOf(hot, maxHistory = 5).count() == 5L)
  }

  test("window chunking properties hold for random (win, stride, doc length) combinations") {
    // randomized sweep of the three invariants the fixed-gate (64, 48)
    // row can't vary: total coverage, exact interior overlap, and
    // RECONSTRUCTION — taking each chunk's first `stride` tokens plus
    // the final chunk's tail re-yields the document exactly
    val rnd = new scala.util.Random(11)
    (1 to 8).foreach { trial =>
      val win = 2 + rnd.nextInt(12)
      val stride = 1 + rnd.nextInt(win)
      val docs = (1 to 6).map { d =>
        val n = 1 + rnd.nextInt(60)
        (d.toLong, (0 until n).map(j => s"t${d}_$j").mkString(" "))
      }
      val chunks = TextAnalysis.windowChunkText(
          docs.toDF("doc_id", "text"), win, stride)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      docs.foreach { case (id, text) =>
        val toks = text.split(" ")
        val cs = chunks(id)
        // coverage + exact interior overlap
        assert(cs.flatMap(c => c._3 until (c._3 + c._4)).toSet ==
          toks.indices.map(_.toLong).toSet,
          s"trial $trial (win=$win stride=$stride): coverage hole in doc $id")
        cs.sliding(2).foreach {
          case Array(a, b) =>
            assert((a._3 + a._4) - b._3 == (win - stride).toLong ||
              a._3 + a._4 >= toks.length,
              s"trial $trial: overlap != win-stride between chunks ${a._2},${b._2}")
          case _ => ()
        }
        // reconstruction: first `stride` tokens of each chunk, full tail
        val rebuilt = cs.init.map(_._5.split(" ").take(stride).mkString(" ")) :+
          cs.last._5
        assert(rebuilt.mkString(" ") == text,
          s"trial $trial (win=$win stride=$stride): reconstruction failed for doc $id")
      }
    }
  }

  test("trend recovers planted exact slopes, negative slopes, and NULLs a single-day type") {
    // plant exact integer lines in the DAILY cents series: "up" grows
    // 3 cents/day (slope_cents_permille = 3000 exactly — zero
    // residual), "down" falls 2/day (-2000), "flat" is constant (0),
    // "one" has a single day (den = 0 → NULL, not a crash). One event
    // per type-day, value = cents/100, so the daily rollup IS the line.
    val rows =
      (0 until 10).map(d => (f"2024-03-${d + 1}%02d", "up", (50 + 3 * d) / 100.0)) ++
      (0 until 10).map(d => (f"2024-03-${d + 1}%02d", "down", (90 - 2 * d) / 100.0)) ++
      (0 until 10).map(d => (f"2024-03-${d + 1}%02d", "flat", 0.42)) ++
      Seq(("2024-03-05", "one", 1.23))
    val df = rows.zipWithIndex.map { case ((day, t, v), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(s"$day 12:00:00"), 1L, t, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.trendOf(df).collect().map { r =>
      r.getString(0) -> (if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))
    }.toMap
    assert(got("up") == (Some(0L), Some(3000L)))   // count flat, cents +3/day
    assert(got("down") == (Some(0L), Some(-2000L)))
    assert(got("flat") == (Some(0L), Some(0L)))
    assert(got("one") == (None, None))
  }

  test("prefix join == brute force on random corpora (no false negatives, no extras)") {
    // the prefix-filter theorem is the operator's whole value: for ANY
    // total token order, every pair with J >= tau shares a prefix
    // token. Pin the engine's (df, shingle) ordering against a plain
    // JVM all-pairs scan on randomized corpora with planted near-dups,
    // across three thresholds including exact-only tau = 1000, plus
    // docs too short to shingle.
    val rnd = new scala.util.Random(17)
    val pool = ('a' to 'z').map(c => s"w$c")
    def doc(n: Int) = Seq.fill(n)(pool(rnd.nextInt(pool.size))).mkString(" ")
    val base = (1L to 30L).map(i => (i, doc(8 + rnd.nextInt(20))))
    val mutated = base.take(10).map { case (i, t) =>
      val ws = t.split(" ")
      val k = rnd.nextInt(3) // 0 = exact copy
      val m = ws.indices.take(k).foldLeft(ws)((a, j) =>
        a.updated(j, pool(rnd.nextInt(pool.size))))
      (100L + i, m.mkString(" "))
    }
    val short = Seq((500L, "one two"), (501L, "x"), (502L, "one two"))
    val docs = (base ++ mutated ++ short).toDF("doc_id", "text")

    def shingles(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < 3) Set.empty
      else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val sets = (base ++ mutated ++ short).map { case (i, t) => i -> shingles(t) }.toMap
    for (tau <- Seq(400L, 700L, 1000L)) {
      val expected = (for {
        a <- sets.keys; b <- sets.keys
        if a < b && sets(a).nonEmpty && sets(b).nonEmpty
        inter = (sets(a) & sets(b)).size
        uni = sets(a).size + sets(b).size - inter
        if 1000L * inter >= tau * uni
      } yield (a, b)).toSet
      val got = Dedup.prefixJoinOn(docs, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      graft.CacheScope.drain()
      assert(got == expected,
        s"tau=$tau: missing=${expected -- got} extra=${got -- expected}")
      if (tau == 400L) assert(expected.nonEmpty, "fixture must plant qualifying pairs")
    }
  }

  test("containment decontamination == brute force; catches the embedded quote Jaccard misses") {
    val rnd = new scala.util.Random(23)
    val pool = ('a' to 'z').map(c => s"v$c")
    def doc(n: Int) = Seq.fill(n)(pool(rnd.nextInt(pool.size))).mkString(" ")
    val bench = (1L to 5L).map(i => (i, doc(6 + rnd.nextInt(6))))
    // corpus: clean docs, one EXACT bench copy, and one bench item
    // QUOTED inside a doc 10x its size — the leakage shape whose
    // Jaccard is tiny but whose containment is 1000
    val clean = (100L to 115L).map(i => (i, doc(10 + rnd.nextInt(30))))
    val copy = (200L, bench(0)._2)
    val quoted = (201L, doc(40) + " " + bench(1)._2 + " " + doc(40))
    val corpus = (clean :+ copy :+ quoted).toDF("doc_id", "text")
    val benchDf = bench.toDF("doc_id", "text")

    def shingles(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < 3) Set.empty
      else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val cSets = (clean :+ copy :+ quoted).map { case (i, t) => i -> shingles(t) }.toMap
    val bSets = bench.map { case (i, t) => i -> shingles(t) }.toMap
    for (tau <- Seq(500L, 800L, 1000L)) {
      val expected = (for {
        (a, sa) <- cSets; (b, sb) <- bSets
        if sb.nonEmpty
        inter = (sa & sb).size
        if 1000L * inter >= tau * sb.size
      } yield (a, b)).toSet
      val got = Dedup.containmentPairsOn(corpus, benchDf, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      graft.CacheScope.drain()
      assert(got == expected,
        s"tau=$tau: missing=${expected -- got} extra=${got -- expected}")
    }
    // the quoted doc IS flagged at tau=1000 (full containment) even
    // though its Jaccard vs the bench item is far below any near-dup
    // threshold — the reason this operator exists next to prefixJoinOn
    val flagged = Dedup.containmentPairsOn(corpus, benchDf, 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CacheScope.drain()
    assert(flagged.contains((201L, 2L)), s"embedded quote not flagged: $flagged")
    val q = shingles(quoted._2); val b2 = bSets(2L)
    val jacc = 1000 * (q & b2).size / (q ++ b2).size
    assert(jacc < 300, s"fixture broken: quoted-doc Jaccard should be small, got $jacc")
    // and the consumer drops exactly the flagged docs, columns intact
    val kept = Dedup.exactDecontaminate(corpus, benchDf, 1000L)
    assert(kept.columns.toSeq == corpus.columns.toSeq)
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    graft.CacheScope.drain()
    assert(!keptIds.contains(200L) && !keptIds.contains(201L))
    assert((100L to 115L).forall(keptIds.contains))

    // declarative twin: exact_decontaminate from the registry equals
    // the library call (bench read against the frame's session)
    val benchPath = tmpDir("exact-decon-bench").resolve("b").toString
    benchDf.write.parquet(benchPath)
    val registry = new graft.exec.TransformRegistry
    graft.exec.CurationTransforms.registerExactDecontaminate(
      registry, benchPath, 1000L)
    val viaTransform = registry("exact_decontaminate")(corpus)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    graft.CacheScope.drain()
    assert(viaTransform == keptIds)
  }

  test("frozen bench-prefix index: serve == in-row pass bit-identically; tau bound; df drift harmless") {
    val rnd = new scala.util.Random(31)
    val pool = ('a' to 'z').map(c => s"w$c")
    def doc(n: Int) = Seq.fill(n)(pool(rnd.nextInt(pool.size))).mkString(" ")
    val bench = (1L to 5L).map(i => (i, doc(6 + rnd.nextInt(6))))
    val clean = (100L to 115L).map(i => (i, doc(10 + rnd.nextInt(30))))
    val quoted = (201L, doc(40) + " " + bench(1)._2 + " " + doc(40))
    val corpus = (clean :+ (200L, bench(0)._2) :+ quoted).toDF("doc_id", "text")
    val benchDf = bench.toDF("doc_id", "text")

    val idxPath = tmpDir("bench-prefix-idx").resolve("i").toString
    Dedup.saveBenchPrefixIndex(corpus, benchDf, 800L, idxPath)
    graft.CacheScope.drain()
    // serve == the in-row gate at the built tau, full rows
    val inRow = Dedup.containmentPairsOn(corpus, benchDf, 800L).collect().toSeq
    graft.CacheScope.drain()
    val frozen = Dedup.containmentPairsFrozen(corpus, idxPath).collect().toSeq
    graft.CacheScope.drain()
    assert(frozen == inRow)
    assert(inRow.nonEmpty, "fixture must plant qualifying pairs")
    // RAISING tau at serve time is sound (prefixes are a superset)...
    val at1000 = Dedup.containmentPairsFrozen(corpus, idxPath, Some(1000L))
      .collect().toSeq
    graft.CacheScope.drain()
    val inRow1000 = Dedup.containmentPairsOn(corpus, benchDf, 1000L).collect().toSeq
    graft.CacheScope.drain()
    assert(at1000 == inRow1000)
    // ...LOWERING it needs prefix tokens that were never stored
    intercept[IllegalArgumentException](
      Dedup.containmentPairsFrozen(corpus, idxPath, Some(500L)))
    // df drift: an index frozen against a DIFFERENT reference corpus
    // (other document frequencies → other prefix choices) must still
    // produce the identical verified result — the theorem holds for
    // any total order, so drift costs candidates, never correctness
    val driftPath = tmpDir("bench-prefix-drift").resolve("i").toString
    Dedup.saveBenchPrefixIndex(
      clean.take(5).toDF("doc_id", "text"), benchDf, 800L, driftPath)
    graft.CacheScope.drain()
    val drifted = Dedup.containmentPairsFrozen(corpus, driftPath).collect().toSeq
    graft.CacheScope.drain()
    assert(drifted == inRow)
    // the frozen declarative registration equals the recomputing one
    val registry = new graft.exec.TransformRegistry
    graft.exec.CurationTransforms.registerExactDecontaminateFrozen(
      registry, idxPath)
    val keptFrozen = registry("exact_decontaminate")(corpus)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    graft.CacheScope.drain()
    val keptInRow = Dedup.exactDecontaminate(corpus, benchDf, 800L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    graft.CacheScope.drain()
    assert(keptFrozen == keptInRow)
    // the stateless per-row broadcast serve (the streaming-tick path)
    // drops exactly the same docs as the shuffle path
    val served = Dedup.exactDecontaminateServe(corpus, idxPath)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    graft.CacheScope.drain()
    assert(served == keptInRow)
    // its broadcast ceiling fails loudly, naming the shuffle path
    val tiny = intercept[IllegalArgumentException](
      Dedup.exactDecontaminateServe(corpus, idxPath, maxBenchShingles = 1L))
    assert(tiny.getMessage.contains("exactDecontaminateFrozen"))
  }

  test("frozen bench-prefix index: raised-tau soundness over random (built, served) pairs") {
    // r14 verdict #7: the tau-safety DIRECTIONALITY as a property, not
    // a single point — an index built at tau_b serves ANY tau' >= tau_b
    // with results identical to the in-row pass at tau' (a higher
    // threshold needs a SHORTER prefix, so the stored prefixes are a
    // superset and the exact verify does the rest). Machine-checks the
    // superset claim the loadBenchPrefixIndex guard relies on.
    val rnd = new scala.util.Random(57)
    val pool = ('a' to 'z').map(c => s"v$c")
    def doc(n: Int) = Seq.fill(n)(pool(rnd.nextInt(pool.size))).mkString(" ")
    val bench = (1L to 6L).map(i => (i, doc(5 + rnd.nextInt(8))))
    val clean = (100L to 117L).map(i => (i, doc(10 + rnd.nextInt(30))))
    // plant a graded-containment ladder so different tau' cut the pair
    // set at different points: exact copies, embedded quotes, and a
    // three-quarter overlap
    val planted = Seq(
      (200L, bench(0)._2),
      (201L, doc(30) + " " + bench(1)._2 + " " + doc(30)),
      (202L, bench(2)._2 + " " + bench(2)._2.split(" ").take(3).mkString(" ")))
    val corpus = (clean ++ planted).toDF("doc_id", "text")
    val benchDf = bench.toDF("doc_id", "text")
    (1 to 4).foreach { i =>
      val tauB = 300L + rnd.nextInt(600) // [300, 899]
      val tauS = tauB + rnd.nextInt((1000L - tauB).toInt + 1) // [tauB, 1000]
      val p = tmpDir(s"raised-tau-$i").resolve("i").toString
      Dedup.saveBenchPrefixIndex(corpus, benchDf, tauB, p)
      graft.CacheScope.drain()
      val served = Dedup.containmentPairsFrozen(corpus, p, Some(tauS))
        .collect().toSeq
      graft.CacheScope.drain()
      val inRow = Dedup.containmentPairsOn(corpus, benchDf, tauS)
        .collect().toSeq
      graft.CacheScope.drain()
      assert(served == inRow,
        s"built at $tauB, served at $tauS: frozen != in-row " +
          s"(${served.size} vs ${inRow.size} rows)")
      // serving BELOW the built tau must refuse, whatever the gap
      if (tauB > 1)
        intercept[IllegalArgumentException](
          Dedup.containmentPairsFrozen(corpus, p, Some(tauB - 1)))
    }
  }
}
