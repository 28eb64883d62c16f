package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
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

  /** Single-threaded union-find reference model. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(v => v -> find(v)).toMap
  }

  test("property: connectedComponents == union-find on random graphs") {
    val s = spark
    import s.implicits._
    // kept deliberately small: every sample costs a full multi-round
    // distributed fixpoint (a dozen Spark jobs), so a handful of samples
    // with a worst-case chain beats a large random sweep
    val genPairs = for {
      n <- Gen.choose(2, 16) // vertex universe
      m <- Gen.choose(1, 20) // edges
      pairs <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield pairs
    val prop = Prop.forAll(genPairs) { pairs =>
      pairs.isEmpty || {
        val df = DedupOps.connectedComponents(pairs.toDF("a_id", "b_id"))
        val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        df.unpersist()
        got == unionFind(pairs)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(6).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("a 100-hop chain converges (requires pointer jumping: diameter > round cap)") {
    import spark.implicits._
    val chain = (0L until 100L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val got = DedupOps.connectedComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 100L).map(_ -> 0L).toMap)
  }

  test("stress: 2048-hop chain + 50k-spoke supernode converge in O(log d) rounds") {
    // the two adversarial topologies for label propagation at once:
    // a large-DIAMETER component (worst case for rounds — linear without
    // pointer jumping) and a hub whose label feeds 50k neighbors every
    // round (worst case for per-round skew). The edge count (52k) is
    // above the sf0.1 near-dup graph's; correctness AND the round bound
    // are asserted, since an O(diameter) loop would pass correctness
    // while being unrunnable at 100 TB.
    import spark.implicits._
    val d = 2048
    val chain = (0L until d.toLong).map(i => (i, i + 1))
    val hub = 1000000L
    val spokes = (1L to 50000L).map(k => (hub, hub + k))
    val pairs = (chain ++ spokes).toDF("a_id", "b_id")
    val (df, rounds) = DedupOps.connectedComponentsWithRounds(pairs)
    val labels = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == (d + 1) + 50001)
    assert((0L to d.toLong).forall(labels(_) == 0L), "chain must collapse to vertex 0")
    assert((hub to hub + 50000L).forall(labels(_) == hub), "star must collapse to the hub")
    // 3 one-hop rounds, then pointer jumping halves the remaining depth
    // per round: ceil(log2 d) more, +3 slack for convergence detection
    val bound = 3 + math.ceil(math.log(d.toDouble) / math.log(2.0)).toInt + 3
    assert(rounds <= bound, s"took $rounds rounds, bound is $bound (diameter $d)")
  }

  test("connectedComponents on an EMPTY pair set returns empty (no NPE)") {
    // a corpus with zero near-dup pairs is legitimately reachable (e.g.
    // phash clustering at tiny SF) — the convergence count must coalesce
    // the null sum instead of crashing
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(DedupOps.connectedComponents(empty).count() == 0)
  }
}
