package graft.functions

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** The native codegen `simhash64` must be a drop-in, bit-identical
  * replacement for the interpreted HOF formulation it superseded
  * (Dedup.simhashFromMd5s over md5'd words) — fingerprints, null
  * semantics, and edge shapes all equal, on real fixture text and on
  * adversarial synthetic rows.
  */
class SimHash64Spec extends SparkSpec {

  private def register(): Unit = GraftExtensions.register(spark)

  test("simhash64 equals the HOF md5-fold bit-for-bit on fixture documents") {
    register()
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val both = docs.select(
      $"doc_id",
      call_function("simhash64", split($"text", " ")).as("fast"),
      Dedup.simhashFromMd5s(Dedup.wordMd5s($"text")).as("slow"))
    assert(both.count() > 0)
    assert(both.filter($"fast" =!= $"slow").count() == 0)
  }

  test("simhash64 edge shapes: empty text, single word, null array, null element") {
    register()
    import spark.implicits._
    // split("", " ") yields [""], md5("") still votes — HOF and native must
    // agree; row 4 forces multi-byte UTF-8 words (md5 hashes the UTF-8
    // bytes on both paths)
    val texts = Seq((1L, ""), (2L, "word"), (3L, "a a a b"),
      (4L, "héllo wörld 你好 🙂")).toDF("id", "text")
    val t = texts.select($"id",
      call_function("simhash64", split($"text", " ")).as("fast"),
      Dedup.simhashFromMd5s(Dedup.wordMd5s($"text")).as("slow"))
      .collect()
    t.foreach(r => assert(r.getLong(1) == r.getLong(2), s"id ${r.getLong(0)}"))

    // null array → null on both sides
    val nullArr = spark.sql("SELECT simhash64(CAST(NULL AS ARRAY<STRING>)) AS v")
      .collect().head
    assert(nullArr.isNullAt(0))

    // a null ELEMENT votes −1 on every bit in the HOF fold (md5(null) →
    // null → otherwise(−1)); the native expression must match
    val withNullElem = Seq(1).toDF("x").select(
      array(lit("hello"), lit(null).cast("string"), lit("world")).as("ws"))
    val pair = withNullElem.select(
      call_function("simhash64", $"ws").as("fast"),
      Dedup.simhashFromMd5s(transform($"ws", w => md5(w))).as("slow"))
      .collect().head
    assert(pair.getLong(0) == pair.getLong(1))
  }

  test("simhash64 runs inside whole-stage codegen (no fallback)") {
    register()
    import spark.implicits._
    // a parquet-backed scan, so the projection can't constant-fold away
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(call_function("simhash64", split($"text", " ")).as("sh"))
    val codegenStages = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenStages.exists(_.toString.contains("simhash64")),
      df.queryExecution.executedPlan.toString)
  }
}
