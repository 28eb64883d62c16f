package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SampleOps

/** The FFD packer's guarantees must hold for ARBITRARY item sets:
  * placement is a permutation, capacity is respected for packable items,
  * oversize items stay alone, bins meet the token-mass lower bound, and
  * the first-fit waste bound (at most one non-oversize bin at or below
  * half fill) holds. Pure-Scala property test — the Spark-side exactness
  * is pinned by the Python oracle and SampleOpsSpec.
  */
class FfdPropertySpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 80): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  private val genItems: Gen[(Long, List[(Long, Long)])] = for {
    cap <- Gen.choose(16L, 512L)
    n <- Gen.choose(0, 150)
    lens <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.choose(1L, cap),          // packable
      1 -> Gen.choose(cap + 1, cap * 3), // oversize
      1 -> Gen.const(cap)))              // exact-fit boundary
  } yield (cap, lens.zipWithIndex.map { case (l, i) => (i.toLong, l) })

  test("FFD: permutation, capacity, isolation, mass bound, waste bound") {
    checkProp(Prop.forAll(genItems) { case (cap, items) =>
      val placed = SampleOps.ffdPack(items, cap)
      val byBin = placed.groupBy(_._2)
      val fills = byBin.map { case (b, xs) => b -> xs.map(_._3).sum }
      val perm = placed.map(_._1).sorted == items.map(_._1).sorted
      val capOk = byBin.forall { case (b, xs) =>
        xs.forall(_._3 > cap) || fills(b) <= cap }
      val oversizeAlone = byBin.forall { case (_, xs) =>
        !xs.exists(_._3 > cap) || xs.size == 1 }
      // mass bound applies to PACKABLE items only (an oversize item's
      // solo bin exceeds cap, so total mass over cap under-counts bins)
      val oversize = items.count(_._2 > cap)
      val packMass = items.filter(_._2 <= cap).map(_._2).sum
      val lb = oversize + (packMass + cap - 1) / cap
      val massOk = items.isEmpty || byBin.size >= lb
      // first-fit: at most ONE bin of packable items sits at ≤ cap/2
      // (two half-empty bins would have been merged by first-fit)
      val halfEmpty = byBin.count { case (b, xs) =>
        xs.forall(_._3 <= cap) && fills(b) * 2 <= cap }
      val wasteOk = halfEmpty <= 1
      perm && capOk && oversizeAlone && massOk && wasteOk
    })
  }

  test("FFD is deterministic and insensitive to input order") {
    checkProp(Prop.forAll(genItems) { case (cap, items) =>
      val a = SampleOps.ffdPack(items, cap)
      val b = SampleOps.ffdPack(scala.util.Random.shuffle(items), cap)
      a.sortBy(_._1) == b.sortBy(_._1) // the sort inside makes order moot
    })
  }
}
