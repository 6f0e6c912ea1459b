package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Nvl}

/** SparkSessionExtensions entry point (SURVEY.md §4: the only custom
  * registration the rebuild needs — T-SQL scalar compatibility aliases
  * so queries written for the reference's SQL Server passthrough run
  * unchanged). Injected via
  * `spark.sql.extensions=graft.functions.GraftExtensions` or
  * `GraftExtensions.register(spark)` on a live session.
  *
  * No custom optimizer rules or strategies: every operator in the
  * catalog is expressible with Catalyst built-ins, and the "one lazy
  * plan per pipeline" design means cross-step pushdown already happens
  * (SURVEY.md §4 "likely zero custom rules needed" — held true).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  // T-SQL ISNULL(a, b) ≡ NVL/COALESCE-2: the reference's users write
  // this constantly against SQL Server (core/extractors/sqlserver.py
  // passthrough); Spark's own `isnull` is the 1-arg null predicate,
  // so expose the 2-arg form under a distinct name.
  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      new FunctionIdentifier("tsql_isnull"),
      new ExpressionInfo(classOf[Nvl].getCanonicalName, "tsql_isnull"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "tsql_isnull(expr, replacement)")
        new Nvl(children.head, children(1))
      }),
    (
      new FunctionIdentifier("hamming64"),
      new ExpressionInfo(classOf[HammingDistance].getCanonicalName, "hamming64"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "hamming64(fingerprint, fingerprint)")
        HammingDistance(children.head, children(1))
      }),
    (
      new FunctionIdentifier("bridged_dot"),
      new ExpressionInfo(classOf[BridgedDot].getCanonicalName, "bridged_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "bridged_dot(ARRAY<FLOAT>, ARRAY<FLOAT>)")
        BridgedDot(children.head, children(1))
      }),
    (
      new FunctionIdentifier("dot64"),
      new ExpressionInfo(classOf[Dot64].getCanonicalName, "dot64"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "dot64(ARRAY<BIGINT>, ARRAY<BIGINT>)")
        Dot64(children.head, children(1))
      }),
    (
      new FunctionIdentifier("quantize1e4"),
      new ExpressionInfo(classOf[Quantize1e4].getCanonicalName, "quantize1e4"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "quantize1e4(ARRAY<FLOAT>)")
        Quantize1e4(children.head)
      }),
    (
      new FunctionIdentifier("sqdist64"),
      new ExpressionInfo(classOf[SqDist64].getCanonicalName, "sqdist64"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "sqdist64(ARRAY<BIGINT>, ARRAY<BIGINT>)")
        SqDist64(children.head, children(1))
      }),
    (
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getCanonicalName, "simhash64"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "simhash64(ARRAY<STRING> words)")
        SimHash64(children.head)
      }),
    (
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getCanonicalName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "nfc_normalize(string)")
        NfcNormalize(children.head)
      }),
    (
      new FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[KmvDistinct].getCanonicalName, "kmv_distinct"),
      (children: Seq[Expression]) => {
        require(children.size == 1 || children.size == 2,
          "kmv_distinct(expr[, k]) — arbitrary input is hashed with xxhash64")
        val k = if (children.size == 2)
          children(1).eval(null).asInstanceOf[Number].intValue()
        else 1024
        KmvDistinct(new org.apache.spark.sql.catalyst.expressions.XxHash64(
          Seq(children.head)), k).toAggregateExpression()
      }),
    (
      new FunctionIdentifier("kmv_state"),
      new ExpressionInfo(classOf[KmvState].getCanonicalName, "kmv_state"),
      (children: Seq[Expression]) => {
        require(children.size == 1 || children.size == 2,
          "kmv_state(expr[, k]) — arbitrary input is hashed with xxhash64")
        val k = if (children.size == 2)
          children(1).eval(null).asInstanceOf[Number].intValue()
        else 1024
        KmvState(new org.apache.spark.sql.catalyst.expressions.XxHash64(
          Seq(children.head)), k).toAggregateExpression()
      }),
    (
      new FunctionIdentifier("damerau_lev"),
      new ExpressionInfo(classOf[DamerauLevenshtein].getCanonicalName, "damerau_lev"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "damerau_lev(string, string)")
        DamerauLevenshtein(children.head, children(1))
      }),
    (
      new FunctionIdentifier("freq_topk"),
      new ExpressionInfo(classOf[FreqTopK].getCanonicalName, "freq_topk"),
      (children: Seq[Expression]) => {
        require(children.size >= 1 && children.size <= 3,
          "freq_topk(item[, k[, capacity]]) — Misra-Gries heavy hitters")
        def lit(i: Int, dflt: Int) = if (children.size > i)
          children(i).eval(null).asInstanceOf[Number].intValue() else dflt
        FreqTopK(children.head, lit(1, 10), lit(2, 256)).toAggregateExpression()
      }),
    (
      new FunctionIdentifier("kmv_merge"),
      new ExpressionInfo(classOf[KmvMerge].getCanonicalName, "kmv_merge"),
      (children: Seq[Expression]) => {
        require(children.size == 1 || children.size == 2,
          "kmv_merge(state[, k]) — merges serialized kmv_state sketches")
        val k = if (children.size == 2)
          children(1).eval(null).asInstanceOf[Number].intValue()
        else 1024
        KmvMerge(children.head, k).toAggregateExpression()
      }),
    (
      new FunctionIdentifier("bks_quantile"),
      new ExpressionInfo(classOf[BksQuantile].getCanonicalName, "bks_quantile"),
      (children: Seq[Expression]) => {
        require(children.size == 3 || children.size == 4,
          "bks_quantile(priority, value, p_permille[, k]) — bottom-k sample quantile")
        def lit(i: Int) = children(i).eval(null).asInstanceOf[Number].intValue()
        BksQuantile(children.head, children(1), lit(2),
          if (children.size == 4) lit(3) else 256).toAggregateExpression()
      }),
    (
      new FunctionIdentifier("bks_state"),
      new ExpressionInfo(classOf[BksState].getCanonicalName, "bks_state"),
      (children: Seq[Expression]) => {
        require(children.size == 2 || children.size == 3,
          "bks_state(priority, value[, k]) — serialized bottom-k sample")
        BksState(children.head, children(1),
          if (children.size == 3)
            children(2).eval(null).asInstanceOf[Number].intValue()
          else 256).toAggregateExpression()
      }),
    (
      new FunctionIdentifier("bks_quantile_merge"),
      new ExpressionInfo(
        classOf[BksQuantileMerge].getCanonicalName, "bks_quantile_merge"),
      (children: Seq[Expression]) => {
        require(children.size == 2 || children.size == 3,
          "bks_quantile_merge(state, p_permille[, k]) — merges bks_state samples")
        def lit(i: Int) = children(i).eval(null).asInstanceOf[Number].intValue()
        BksQuantileMerge(children.head, lit(1),
          if (children.size == 3) lit(2) else 256).toAggregateExpression()
      }),
    // Bloom-filter membership, built on Spark's OWN sketch machinery
    // (org.apache.spark.util.sketch.BloomFilter — the exact classes the
    // engine's runtime row-level filtering injects, so the aggregate is
    // codegen-compatible, merge-associative, and battle-tested). Exposed
    // as SQL functions because BloomFilterMightContain requires its
    // bloom side to be a constant or scalar subquery — the natural
    // usage is `bloom_contains((SELECT bf FROM built), h)`, which plans
    // the subquery once and broadcasts the filter as a literal to every
    // probe site, the classic build-small/probe-huge asymmetry a 100 TB
    // decontamination pass needs (the corpus never shuffles).
    (
      new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate]
          .getCanonicalName, "bloom_agg"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "bloom_agg(hash BIGINT, est_items BIGINT, num_bits BIGINT)")
        // the sizing args must be BIGINT-typed foldables; SQL integer
        // literals arrive as INT, so coerce here (Cast of a literal
        // stays foldable, which BloomFilterAggregate requires)
        def asLong(e: Expression) = org.apache.spark.sql.catalyst.expressions.Cast(
          e, org.apache.spark.sql.types.LongType)
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children.head, asLong(children(1)), asLong(children(2))).toAggregateExpression()
      }),
    (
      new FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]
          .getCanonicalName, "bloom_contains"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "bloom_contains(bloom BINARY (constant or scalar subquery), hash BIGINT)")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))
      }))

  /** Register on an already-built session (tests, notebooks) via the
    * session's own function registry. Idempotent.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
