package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.expr

/** Bottom-k sample quantile sketch: exact at-or-below k, lossless
  * merge of stored states (merged ≡ single-shot, exactly), bounded
  * error above k, deterministic across partitionings, parquet-stable
  * states — the contracts `q_agg_quantile_rollup`'s oracle leans on.
  */
class BkSampleSpec extends SparkSpec {
  import spark.implicits._

  // shuffled-but-deterministic priorities: the Knuth multiplicative
  // permutation the catalog row uses (distinct ids → distinct-ish
  // priorities uncorrelated with the value order)
  private def prio(id: Int): Long =
    math.floorMod(math.floorMod(id.toLong, 2654435761L) * 2654435761L,
      1099511627776L)

  test("exact lower quantile when the group fits in k") {
    GraftExtensions.register(spark)
    // 101 rows, values 0..1000 step 10 — p50 = 500, p90 = 900 exactly
    val df = (0 to 100).map(i => (prio(i), i * 10L)).toDF("p", "v").repartition(7)
    val out = df.selectExpr(
      "bks_quantile(p, v, 500) AS p50", "bks_quantile(p, v, 900) AS p90")
      .as[(Long, Long)].head()
    assert(out == ((500L, 900L)), s"got $out")
  }

  test("merge of stored states equals single-shot exactly — above k too") {
    GraftExtensions.register(spark)
    // 50k rows (≫ k=256) split in 10 parts: bottom-k merge is lossless,
    // so the merged sample — and hence the estimate — is IDENTICAL to
    // the one-shot sketch, not just close
    val df = (1 to 50000).map(i => (i % 10, prio(i), (i * 7 % 9973).toLong))
      .toDF("part", "p", "v").persist()
    val oneShot = df.selectExpr("bks_quantile(p, v, 500) AS q").as[Long].head()
    val merged = df.groupBy($"part")
      .agg(expr("bks_state(p, v)").as("st"))
      .selectExpr("bks_quantile_merge(st, 500) AS q").as[Long].head()
    assert(merged == oneShot, s"merged $merged != one-shot $oneShot")
    df.unpersist()
  }

  test("estimate within binomial-order error of the exact quantile above k") {
    GraftExtensions.register(spark)
    // values are a permutation of 1..50000 → exact p-quantile ≈ p·n;
    // k=256 gives σ ≈ √(0.25/256) ≈ 3.1% of the range at p50
    val n = 50000
    val df = (1 to n).map(i => (prio(i), (i.toLong * 48271) % n + 1)).toDF("p", "v")
    val est = df.selectExpr("bks_quantile(p, v, 500) AS q").as[Long].head()
    val exact = n / 2
    assert(math.abs(est - exact).toDouble / n < 0.12,
      s"p50 estimate $est vs exact ~$exact drifted beyond 12% of range")
  }

  test("priority ties keep the smaller value deterministically") {
    GraftExtensions.register(spark)
    // two rows with THE SAME priority and different values: the sketch
    // must keep min(v) regardless of arrival/partition order (the rule
    // the DuckDB oracle mirrors)
    val df = Seq((5L, 90L), (5L, 10L), (1L, 50L)).toDF("p", "v").repartition(3)
    val q = df.selectExpr("bks_quantile(p, v, 1000) AS q").as[Long].head()
    // sample after dedup = {(1,50),(5,10)} → max value = 50, not 90
    assert(q == 50L, s"tie kept the wrong value: max sampled = $q")
  }

  test("bks_state survives a parquet round-trip and still merges exactly") {
    GraftExtensions.register(spark)
    val dir = tmpDir("bks-states").toString
    val df = (1 to 9000).map(i => (i % 3, prio(i), (i % 701).toLong))
      .toDF("day", "p", "v").persist()
    df.groupBy($"day").agg(expr("bks_state(p, v)").as("st"))
      .write.mode("overwrite").parquet(dir)
    val merged = spark.read.parquet(dir)
      .selectExpr("bks_quantile_merge(st, 900) AS q").as[Long].head()
    val oneShot = df.selectExpr("bks_quantile(p, v, 900) AS q").as[Long].head()
    assert(merged == oneShot, s"round-tripped merge $merged != one-shot $oneShot")
    df.unpersist()
  }

  test("p_permille outside [0, 1000] fails at plan time with a clear message") {
    GraftExtensions.register(spark)
    val df = Seq((1L, 10L)).toDF("p", "v")
    // out-of-range permille used to index past the sample array and
    // throw ArrayIndexOutOfBounds at aggregation EVAL time; it must
    // fail when the expression is built, naming the bound
    def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(c => String.valueOf(c.getMessage)).mkString(" | ")
    for (bad <- Seq("1500", "-1")) {
      val ex = intercept[Exception] {
        df.selectExpr(s"bks_quantile(p, v, $bad)").collect()
      }
      assert(chain(ex).contains("[0, 1000]"), s"permille $bad: got ${chain(ex)}")
      val ex2 = intercept[Exception] {
        df.selectExpr("bks_state(p, v) AS st")
          .selectExpr(s"bks_quantile_merge(st, $bad)").collect()
      }
      assert(chain(ex2).contains("[0, 1000]"), s"merge permille $bad: got ${chain(ex2)}")
    }
  }
}
