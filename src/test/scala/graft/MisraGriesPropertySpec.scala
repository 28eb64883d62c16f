package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MisraGries

/** The Misra-Gries guarantees must hold for ARBITRARY streams and
  * ARBITRARY partitionings (the merge path is what distribution
  * exercises): estimates never overcount, undercount by at most
  * N/(C+1) per merge level, and every item above the bound survives.
  * Pure-Scala property test — no Spark session needed; the Spark-side
  * exactness is pinned by the oracle row and AccuracySpec.
  */
class MisraGriesPropertySpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 60): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  private val genStream: Gen[(Int, List[String], Int)] = for {
    cap <- Gen.choose(2, 12)
    n <- Gen.choose(0, 400)
    // skewed alphabet: a few heavy items + a long tail
    items <- Gen.listOfN(n, Gen.frequency(
      5 -> Gen.oneOf("hot1", "hot2"),
      3 -> Gen.oneOf("warm1", "warm2", "warm3"),
      2 -> Gen.choose(0, 200).map(i => s"cold$i")))
    nParts <- Gen.choose(1, 8)
  } yield (cap, items, nParts)

  test("MG summary: never overcounts, undercounts <= levels*N/(C+1), heavy items survive") {
    checkProp(Prop.forAll(genStream) { case (cap, items, nParts) =>
      val mg = new MisraGries(cap)
      // simulate the distributed shape: partition the stream, reduce each
      // partition independently, then fold the merges (one merge level)
      val parts = items.zipWithIndex.groupBy(_._2 % nParts)
        .values.map(_.map(_._1)).toList
      val summaries = parts.map(p => p.foldLeft(mg.zero)(mg.reduce))
      val merged = summaries.foldLeft(mg.zero)(mg.merge)
      val out = mg.finish(merged).toMap
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = items.size.toLong
      // each reduce-decrement and each merge-truncation removes at most
      // one occurrence of an item per N/(C+1) stream positions; with one
      // merge level the total slack stays <= 2*N/(C+1)
      val bound = 2.0 * n / (cap + 1)
      val noOver = out.forall { case (k, est) => est <= exact.getOrElse(k, 0L) }
      val inBound = out.forall { case (k, est) => exact(k) - est <= bound }
      val heavySurvive = exact.forall { case (k, t) => t <= bound || out.contains(k) }
      val sizeBounded = out.size <= cap
      noOver && inBound && heavySurvive && sizeBounded
    })
  }

  test("MG merge: order-insensitive on disjoint-free summaries (same multiset, any split)") {
    checkProp(Prop.forAll(genStream) { case (cap, items, _) =>
      val mg = new MisraGries(cap)
      // two different partitionings of the same multiset must yield
      // summaries whose guaranteed-heavy survivors agree
      val n = items.size.toLong
      val bound = 2.0 * n / (cap + 1)
      def run(parts: List[List[String]]) = mg.finish(
        parts.map(p => p.foldLeft(mg.zero)(mg.reduce)).foldLeft(mg.zero)(mg.merge)).toMap
      val a = run(items.grouped(math.max(1, items.size / 3 + 1)).toList)
      val b = run(List(items))
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      exact.filter(_._2 > bound).keys.forall(k => a.contains(k) && b.contains(k))
    })
  }
}
