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

  test("dataDiff classifies NULL-keyed rows by presence, not key nullness") {
    // an === join never matches NULL keys, which used to dump a
    // NULL-keyed row from snapshot A into 'added' (it is A-only →
    // 'removed') and vice versa; presence markers + <=> fix both sides
    val a = Seq((Option.empty[Long], "only-in-a"), (Some(1L), "x"))
      .toDF("k", "v")
    val b = Seq((Some(1L), "x")).toDF("k", "v")
    val ab = Validation.dataDiff(a, b, "k", Seq("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ab == Map("removed" -> 1L, "unchanged" -> 1L), ab.toString)
    val ba = Validation.dataDiff(b, a, "k", Seq("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ba == Map("added" -> 1L, "unchanged" -> 1L), ba.toString)
    // NULL keys on both sides pair up (null-safe join): same value →
    // unchanged, different value → changed
    val a2 = Seq((Option.empty[Long], "s")).toDF("k", "v")
    val b2 = Seq((Option.empty[Long], "t")).toDF("k", "v")
    val st = Validation.dataDiff(a2, b2, "k", Seq("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st == Map("changed" -> 1L), st.toString)
  }

  test("dataDiff rejects an empty compare list") {
    val a = Seq((1L, "x")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Validation.dataDiff(a, a, "k", Seq.empty)
    }
  }
}
