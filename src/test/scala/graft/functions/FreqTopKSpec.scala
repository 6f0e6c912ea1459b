package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[FreqTopK]] (Misra–Gries heavy hitters): the gate row
  * (q_agg_heavy_hitters_auto) pins only the exact regime; this spec owns the
  * sketch properties — exact counts below capacity regardless of
  * partitioning, the eviction path, the distributed merge trim, and the
  * N/(capacity+1) underestimate bound.
  */
class FreqTopKSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  private def topkOf(items: Seq[String], k: Int, cap: Int, parts: Int): String =
    items.toDF("item").repartition(parts)
      .agg(expr(s"freq_topk(item, $k, $cap)")).as[String].head()

  test("exact regime: counts are exact and partitioning-independent") {
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(25)("c") ++
      Seq.fill(10)("d")
    val expected = "a:40 b:25 c:25 d:10" // b before c: count tie broken by item asc
    for (parts <- Seq(1, 7)) {
      assert(topkOf(scala.util.Random.shuffle(items), 10, 8, parts) == expected)
    }
  }

  test("ties order by item ascending at equal counts") {
    assert(topkOf(Seq("z", "m", "a"), 3, 8, 1) == "a:1 m:1 z:1")
  }

  test("k truncates below the summary size") {
    assert(topkOf(Seq("a", "a", "b", "b", "c"), 2, 8, 1) == "a:2 b:2")
  }

  test("approximate regime: heavy hitter survives eviction with the MG bound") {
    // 60% heavy item in a stream of 500 with 100 distinct light items,
    // capacity 16: true(heavy)=300, underestimate ≤ N/(cap+1) ≈ 29
    val n = 500
    val heavy = Seq.fill(300)("HEAVY")
    val light = (0 until 200).map(i => s"light${i % 100}")
    val out = topkOf(scala.util.Random.shuffle(heavy ++ light), 1, 16, 1)
    val Array(item, count) = out.split(" ").head.split(":")
    assert(item == "HEAVY")
    assert(count.toLong >= 300 - n / 17 && count.toLong <= 300)
  }

  test("distributed merge trims to capacity and keeps the bound") {
    // shards whose union exceeds capacity: merge must end ≤ cap counters
    // and still surface the global heavy hitter at an in-bound count
    val n = 900
    val heavy = Seq.fill(400)("HEAVY")
    val light = (0 until 500).map(i => s"w$i") // all distinct: worst case
    val out = topkOf(scala.util.Random.shuffle(heavy ++ light), 5, 32, 9)
    val head = out.split(" ").head.split(":")
    assert(head(0) == "HEAVY")
    assert(head(1).toLong >= 400 - n / 33 && head(1).toLong <= 400)
    assert(out.split(" ").length <= 5)
  }

  test("auto-sized capacity covers a vocabulary the hand-set default missed") {
    import graft.ops.Aggregates
    // a corpus whose vocabulary (600 distinct terms/group) blows past
    // the gate's hand-set capacity 64 — the r11 10x non-match's shape.
    // heavyHittersAutoSized must pick a power of two with >=1.5x
    // headroom over the measured vocabulary and come back EXACT.
    val docs = (0 until 600).flatMap { t =>
      // term t appears (t % 7) + 1 times -> exact head is knowable
      Seq.fill(t % 7 + 1)((t.toLong, f"t$t%04d w${t % 13}", "en", "src0", 10L))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val cap = Aggregates.heavyHittersAutoCapacity(spark, docs)
    assert(cap >= 64 && (cap & (cap - 1)) == 0, s"capacity must be a pow2 >= 64: $cap")
    assert(cap >= 613 * 3 / 2 - 64, s"headroom too small for ~613 vocab: $cap") // 600 t-terms + 13 w-terms, HLL rsd slack
    val auto = Aggregates.heavyHittersAutoSized(spark, docs, 5)
      .select($"lang", $"top_terms").as[(String, String)].head()
    // exact oracle computed directly: count every term, head by
    // (count desc, term asc)
    val exact = docs.select(explode(split($"text", " ")).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"term".asc).limit(5)
      .as[(String, Long)].collect().map { case (t, n) => s"$t:$n" }.mkString(" ")
    assert(auto == (("en", exact)), s"auto-sized head must be exact: $auto vs $exact")
    // the old hand-set 64 is NOT exact on this corpus - the auto-sizing
    // is doing real work, not restating the default
    val hand = Aggregates.heavyHittersOn(spark, docs, 5, 64)
      .select($"top_terms").as[String].head()
    assert(hand != exact, "capacity 64 should leave the exact regime on 613 terms")
  }

  test("auto capacity bounds: floor 64 on tiny vocab, ceiling 2^20") {
    import graft.ops.Aggregates
    val tiny = Seq((1L, "a b c", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Aggregates.heavyHittersAutoCapacity(spark, tiny) == 64)
    val empty = tiny.filter($"doc_id" < 0)
    assert(Aggregates.heavyHittersAutoCapacity(spark, empty) == 64)
  }

  test("count ties break in UTF-8 byte order, not UTF-16 code-unit order") {
    // U+E000 (private use, 3 UTF-8 bytes 0xEE..) vs U+10000 (4 bytes
    // 0xF0..): UTF-16 compareTo puts the surrogate pair (0xD800..)
    // FIRST, but the DuckDB oracles collate UTF-8 binary where 0xEE <
    // 0xF0 — the sketch must agree or the gate hash breaks on non-BMP
    // vocab
    val bmp = "\uE000"
    val supp = new String(Character.toChars(0x10000))
    assert(bmp.compareTo(supp) > 0) // UTF-16 order would invert...
    val out = topkOf(Seq(supp, bmp, supp, bmp), 2, 8, 1)
    assert(out == s"$bmp:2 $supp:2", // ...UTF-8 order must win
      out.toList.map(_.toInt.toHexString).toString)
  }

  test("nulls are skipped, empty input yields empty string") {
    val withNulls = Seq(Some("x"), None, Some("x"), None).toDF("item")
    assert(withNulls.agg(expr("freq_topk(item, 3, 8)")).as[String].head() == "x:2")
    assert(Seq.empty[String].toDF("item")
      .agg(expr("freq_topk(item, 3, 8)")).as[String].head() == "")
  }
}
