package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Unit tests for the hub-capped triangle guard on synthetic graphs
  * where the expected counts are computable by hand — independent of
  * the LSH fixture the catalog row runs on.
  */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  /** A 4-clique on {1,2,3,4} (every node degree 3, C(4,3)=4 triangles,
    * each node in 3 of them) plus a star hub 100 connected to leaves
    * 101..110 (hub degree 10, leaves degree 1, zero triangles).
    */
  private def fixture = {
    val clique = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)
    val star = (101L to 110L).map(l => (100L, l))
    (clique ++ star).toDF("src", "dst")
  }

  test("uncapped-equivalent high cap keeps the clique, drops nothing") {
    val out = Graph.cappedTriangles(fixture, maxDegree = 100).collect()
    assert(!out.exists(_.getBoolean(2)), "no hubs expected above cap 100")
    val counts = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("cap 5 excludes the star hub, clique triangles unaffected") {
    val out = Graph.cappedTriangles(fixture, maxDegree = 5).collect()
    val hubs = out.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(hubs == Set(100L), "only the degree-10 star center is above cap 5")
    assert(out.filter(_.getBoolean(2)).forall(_.getLong(1) == -1L),
      "hub rows carry the -1 sentinel, never a count")
    val counts = out.filterNot(_.getBoolean(2))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("cap 2 excludes the clique too — graph left triangle-free") {
    val out = Graph.cappedTriangles(fixture, maxDegree = 2).collect()
    val hubs = out.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(hubs == Set(1L, 2L, 3L, 4L, 100L))
    assert(out.filterNot(_.getBoolean(2)).isEmpty,
      "leaves have degree 1 and no surviving triangles exist")
  }

  test("excluding a hub also removes wedges THROUGH it, not just its rows") {
    // path 1-2, 2-3 plus closing edge 1-3 is a triangle; make node 2 a
    // hub by attaching 5 leaves — capping at 5 must drop the whole
    // triangle because its wedge runs through node 2.
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val leaves = (11L to 15L).map(l => (2L, l))
    val out = Graph.cappedTriangles((tri ++ leaves).toDF("src", "dst"), maxDegree = 5)
      .collect()
    assert(out.filter(_.getBoolean(2)).map(_.getLong(0)).toSet == Set(2L))
    assert(out.filterNot(_.getBoolean(2)).isEmpty,
      "1-3 alone cannot close a triangle once node 2's edges are gone")
  }

  test("pagerank: triangle is a fixpoint, isolated node holds the teleport floor") {
    // symmetric 3-cycle: every node's incoming sum is exactly 1 000 000
    // micro-units each round, so rank stays 150000 + 850000 = 1000000
    val nodes = Seq(1L, 2L, 3L, 10L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val r = Graph.pagerankOf(nodes, edges).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L, 10L -> 150000L))
  }

  test("pagerank: 3 hand-computed rounds on the 2-leaf star") {
    // star 1-{2,3}: r1 = (1850000, 575000, 575000),
    // r2 = (1127500, 936250, 936250), r3 = (1741625, 629187, 629187) —
    // every step integer div, computed by hand in the test comment
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
    val r = Graph.pagerankOf(nodes, edges).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 1741625L, 2L -> 629187L, 3L -> 629187L))
  }

  test("hub anti-join side is broadcast — no shuffle added for the cap") {
    val plan = Graph.cappedTriangles(fixture, maxDegree = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.toLowerCase.contains("leftanti"),
      s"expected broadcast anti-joins for the hub filter:\n$plan")
  }

  test("kcore: pendant chain cascades off round by round, core survives") {
    // triangle {1,2,3} with a 3-deep pendant chain 3-10-11-12: node 12
    // peels in round 1 (deg 1), which drops 11 to deg 1 (round 2), then
    // 10 (round 3) — the cascade that makes peeling iterative. After
    // enough rounds only the triangle remains, every member at degree 2.
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 10L), (10L, 11L), (11L, 12L))
      .toDF("src", "dst")
    // not yet converged after 2 rounds: node 10 still present
    val partial = Graph.kcoreOf(g, 2, 2).collect().map(_.getLong(0)).toSet
    assert(partial.contains(10L))
    val core = Graph.kcoreOf(g, 2, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // round 4 (the catalog setting) is a fixpoint on this graph
    val again = Graph.kcoreOf(g, 2, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == core)
  }
}
