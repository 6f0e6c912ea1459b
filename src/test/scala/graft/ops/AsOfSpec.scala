package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

/** As-of join unit semantics incl. the boundary cases SURVEY.md §7
  * flags as a hard part: exact-timestamp ties, no-match rows, tie-break
  * among equal right timestamps.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of picks latest right <= left, per key") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "L1"),
      (1L, ts("2024-01-01 12:00:00"), "L2"),
      (2L, ts("2024-01-01 09:00:00"), "L3"))
      .toDF("k", "lts", "lval")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100L, 1.0),
      (1L, ts("2024-01-01 11:00:00"), 101L, 2.0),
      (2L, ts("2024-01-01 09:30:00"), 102L, 3.0)) // after L3 → no match
      .toDF("rk", "rts", "rid", "rv")
    val out = AsOf.joinBackward(left, right, "k", "rk", "lts", "rts", "rid")
      .orderBy("k", "lts").collect()
    assert(out(0).getAs[Long]("rid") == 100L) // 09:30 <= 10:00
    assert(out(1).getAs[Long]("rid") == 101L) // latest of the two
    assert(out(2).isNullAt(out(2).fieldIndex("rid"))) // left-outer null
  }

  test("equal timestamps match (inclusive) and max tiebreak wins") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "L")).toDF("k", "lts", "lval")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, 1.0),
      (1L, ts("2024-01-01 10:00:00"), 9L, 2.0), // same ts: rid 9 wins
      (1L, ts("2024-01-01 10:00:01"), 11L, 3.0)) // strictly after: excluded
      .toDF("rk", "rts", "rid", "rv")
    val out = AsOf.joinBackward(left, right, "k", "rk", "lts", "rts", "rid").collect()
    assert(out.head.getAs[Long]("rid") == 9L)
  }

  test("keys never cross") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "L")).toDF("k", "lts", "lval")
    val right = Seq((2L, ts("2024-01-01 09:00:00"), 5L, 0.0)).toDF("rk", "rts", "rid", "rv")
    val out = AsOf.joinBackward(left, right, "k", "rk", "lts", "rts", "rid").collect()
    assert(out.head.isNullAt(out.head.fieldIndex("rid")))
  }
}
