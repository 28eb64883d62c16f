package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the scale-corpus generator's per-replica alphabet table
  * (no SparkSession needed — the table is a pure function of n).
  */
class ScaleDataSpec extends AnyFunSuite {
  private val classes = Seq("abcdefghijklmnopqrstuvwxyz",
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "0123456789")

  test("per-class distinctness holds at n=1000 (digit class has collision mass)") {
    val table = ScaleData.permTable(classes, 1000)
    for (ci <- classes.indices) {
      val maps = (1 until 1000).map(k => table(k)(ci))
      assert(maps.distinct.size == maps.size, s"class $ci has duplicate maps")
      assert(!maps.contains(classes(ci)), s"class $ci contains the identity")
    }
  }

  test("guard is a no-op at n=100: sf10 corpus stays bit-identical to r9") {
    // the r9 (unguarded) construction was perm(class, k*7919 + ci) with no
    // rehashing; zero collisions at n=100 means the guarded table matches
    val table = ScaleData.permTable(classes, 100)
    for (k <- 1 until 100; ci <- classes.indices)
      assert(table(k)(ci) == ScaleData.perm(classes(ci), k.toLong * 7919L + ci),
        s"replica $k class $ci rehashed — sf10 data would change")
  }

  test("rehash path fires and resolves on a forced collision") {
    // a 3-char class has 6 permutations, 5 non-identity; n=6 needs all 5
    // distinct, so random draws from 6 possibilities MUST rehash at least
    // once and still converge to 5 pairwise-distinct non-identity maps
    val table = ScaleData.permTable(Seq("abc"), 6)
    val maps = (1 until 6).map(k => table(k)(0))
    assert(maps.distinct.size == 5 && !maps.contains("abc"))
  }

  test("a class with fewer permutations than replicas fails loudly") {
    // "ab" has one non-identity map; 3 replicas can never be distinct —
    // the exhaustion bound must throw instead of spinning forever
    assertThrows[IllegalArgumentException](ScaleData.permTable(Seq("ab"), 4))
  }
}
