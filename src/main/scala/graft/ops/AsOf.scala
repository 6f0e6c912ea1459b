package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-timestamp backward) join — SURVEY.md §2.B "Joins ✚".
  *
  * Spark has no built-in as-of join; per SURVEY.md §4 this is a plain
  * DataFrame pattern, not a custom strategy: tag left/right rows, union
  * them, and carry the latest right payload forward with a window
  * `last(_, ignoreNulls)` ordered by (ts, side, tiebreak).
  *
  * Scale: one shuffle on the key column for both inputs, then a single
  * sorted window pass per key partition — no broadcast of the right side,
  * no per-row subquery, skew bounded by the hottest key. This is the
  * same merge-scan shape a native engine would use.
  *
  * Ties: when several right rows share the match timestamp, the one with
  * the greatest `tiebreak` wins (deterministic; mirror the oracle with
  * `ORDER BY ts DESC, tiebreak DESC LIMIT 1`).
  */
object AsOf {

  /** For each left row, attach the right row with the largest
    * `rightTs <= leftTs` among rows with equal join key (backward
    * as-of, `>=` inclusive). Left rows without a match keep nulls
    * (left-outer semantics). Left/right column names must be disjoint.
    */
  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      rightTiebreak: String): DataFrame = {
    val leftPayload = struct(left.columns.map(col).toIndexedSeq: _*)
    val rightPayload = struct(right.columns.map(col).toIndexedSeq: _*)
    val l = left.select(
      col(leftKey).cast("long").as("_k"), col(leftTs).as("_t"),
      lit(0).as("_isR"), lit(null).cast("long").as("_tb"),
      lit(null).cast(right.select(rightPayload).schema.head.dataType).as("_rp"),
      leftPayload.as("_lp"))
    val r = right.select(
      col(rightKey).cast("long").as("_k"), col(rightTs).as("_t"),
      lit(1).as("_isR"), col(rightTiebreak).cast("long").as("_tb"),
      rightPayload.as("_rp"),
      lit(null).cast(left.select(leftPayload).schema.head.dataType).as("_lp"))
    // Right rows sort before the left row at an equal timestamp (_isR
    // desc) so ts-equal right rows are eligible; among right ties the
    // greatest tiebreak is last, hence picked by last(ignoreNulls).
    val w = Window.partitionBy("_k")
      .orderBy(col("_t").asc, col("_isR").desc, col("_tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("_m", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_isR") === 0)
    val leftCols = left.columns.map(n => col(s"_lp.$n").as(n))
    val rightCols = right.columns.map(n => col(s"_m.$n").as(n))
    matched.select((leftCols ++ rightCols).toIndexedSeq: _*)
  }
}
