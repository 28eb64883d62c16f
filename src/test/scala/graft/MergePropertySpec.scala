package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.MergeOps

/** The distributed changelog apply must agree with the obvious
  * single-threaded model — replay ops in seq order over a map — on
  * arbitrary op sequences, including multiple changes per key, deletes
  * of absent keys, and delete-then-reinsert interleavings.
  */
class MergePropertySpec extends SparkSpec {

  private def checkProp(p: Prop, n: Int = 15): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  private def referenceModel(base: Seq[(Long, String, Double)],
                             log: Seq[(Long, String, Double, String, Long)]): Set[(Long, String, Double)] = {
    val m = scala.collection.mutable.Map(base.map(r => r._1 -> r).toSeq: _*)
    log.sortBy(_._5).foreach {
      case (id, name, v, "upsert", _) => m(id) = (id, name, v)
      case (id, _, _, _, _) => m.remove(id)
    }
    m.values.toSet
  }

  test("applyChangelog == sequential replay on arbitrary op logs") {
    val s = spark
    import s.implicits._
    val genBase = Gen.listOf(for {
      id <- Gen.choose(0L, 12L); v <- Gen.choose(0, 99)
    } yield (id, s"b$id", v.toDouble)).map(_.distinctBy(_._1))
    val genLog = Gen.listOf(for {
      id <- Gen.choose(0L, 15L)
      v <- Gen.choose(0, 99)
      op <- Gen.oneOf("upsert", "delete")
    } yield (id, s"u$v", v.toDouble, op))
      // distinct seq numbers: latest-wins needs a total change order
      .map(_.zipWithIndex.map { case ((id, n, v, op), i) => (id, n, v, op, i.toLong) })
    checkProp(Prop.forAll(genBase, genLog) { (base, log) =>
      val got = MergeOps.applyChangelog(
        base.toDF("id", "name", "v"),
        log.toDF("id", "name", "v", "op", "seq"),
        Seq("id"), "op", "seq")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      got == referenceModel(base, log)
    })
  }
}
