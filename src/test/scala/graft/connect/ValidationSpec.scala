package graft.connect

import graft.SparkSpec

/** [[Validation.dataDiff]] unit semantics on crafted snapshots — the
  * gate row (q_sql_snapshot_diff) pins engine agreement on the fixture;
  * this pins the classification contract: null-SAFE column compares
  * (null→value is changed, null→null is not), and all four statuses.
  */
class ValidationSpec extends SparkSpec {
  import spark.implicits._

  test("dataDiff classifies added/removed/changed/unchanged with null-safe compares") {
    val a = Seq(
      (1L, Some("x")),   // unchanged
      (2L, Some("y")),   // changed (value differs)
      (3L, None),        // unchanged (null on both sides)
      (4L, Some("z")),   // changed (value -> null)
      (5L, Some("r"))    // removed (absent from b)
    ).toDF("k", "v")
    val b = Seq(
      (1L, Some("x")),
      (2L, Some("Y")),
      (3L, None),
      (4L, None),
      (6L, Some("n"))    // added
    ).toDF("k", "v")
    val out = Validation.dataDiff(a, b, "k", Seq("v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      "added" -> ((1L, 6L, 6L)),
      "removed" -> ((1L, 5L, 5L)),
      "changed" -> ((2L, 2L, 4L)),
      "unchanged" -> ((2L, 1L, 3L))))
  }

  test("dataDiff of a snapshot against itself is all-unchanged") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val out = Validation.dataDiff(a, a, "k", Seq("v")).collect()
    assert(out.length == 1 && out.head.getString(0) == "unchanged" &&
      out.head.getLong(1) == 2L)
  }
}
