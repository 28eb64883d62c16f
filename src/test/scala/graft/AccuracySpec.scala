package graft

import graft.operators.{DedupOps, Relational}

/** Accuracy bounds for the sketch operators that can't be cross-engine
  * oracled (the sketch values are engine-specific): each approximate form
  * is checked against its exact twin on testdata.
  */
class AccuracySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q18 approx_count_distinct within 2% of the exact q9 counts") {
    val exact = Relational.q9DistinctAgg(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap // n_parts per flag
    val approx = Relational.q18ApproxDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap // approx_parts
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (flag, e) =>
      val a = approx(flag)
      assert(math.abs(a - e).toDouble / e <= 0.02,
        s"$flag: approx $a vs exact $e exceeds 2%")
    }
  }

  test("q15_approx percentiles within 1% of the exact q15 percentiles") {
    def byFlag(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = byFlag(Relational.q15Percentile(spark, sf))
    val approx = byFlag(Relational.q15Approx(spark, sf))
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (flag, es) =>
      es.zip(approx(flag)).zipWithIndex.foreach { case ((e, a), i) =>
        assert(math.abs(a - e) / e <= 0.01,
          s"$flag p${Seq(50, 90, 99)(i)}: approx $a vs exact $e exceeds 1%")
      }
    }
  }

  test("simhash_banded (global, bucketed) ⊇ simhash_neardup (lang-blocked)") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.select("a_id", "b_id")
      .collect().map(r => (r.get(0).toString, r.get(1).toString)).toSet
    val banded = pairs(DedupOps.simhashBanded(spark, sf))
    val blocked = pairs(DedupOps.simhashNeardup(spark, sf))
    // the banded plan has no blocking key, so it finds every Hamming≤3
    // pair the lang-blocked plan finds (plus any cross-lang ones)
    assert(blocked.subsetOf(banded),
      s"missing: ${blocked.diff(banded).take(5)}")
  }
}
