package graft

import graft.operators.DedupOps

/** Connected components over a synthetic pair graph — the primitive behind
  * dedup_clusters. Covers transitivity (a–b, b–c collapse to one cluster
  * even though (a, c) was never a pair), multi-hop chains (label must
  * propagate more than one round), and isolated pairs.
  */
class DedupClusterSpec extends SparkSpec {

  test("connectedComponents: chains, transitivity, isolated pairs") {
    import spark.implicits._
    // components: {1,2,3,4} (a chain — 3 propagation hops), {10,11}, {20,21,22}
    val pairs = Seq(
      (2L, 1L), (3L, 2L), (4L, 3L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("a_id", "b_id")
    val got = DedupOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L)
    assert(got == want)
  }
}
