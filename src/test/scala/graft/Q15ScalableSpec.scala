package graft

import graft.operators.Relational

/** The two-pass histogram-refinement exact percentile (round-9 verdict
  * #6) must reproduce `percentile`'s interpolated values exactly — the
  * cross-engine gate checks it against DuckDB `quantile_cont`; this pins
  * the in-engine identity against Spark's own aggregate at test SF, so a
  * refactor that breaks rank location or interpolation fails fast
  * without the driver.
  */
class Q15ScalableSpec extends SparkSpec {
  test("histogram-refined exact percentiles == percentile() aggregate") {
    val sf = "/root/testdata/sf0.001"
    val a = Relational.q15Percentile(spark, sf)
      .orderBy("l_returnflag").collect().toSeq
    val b = Relational.q15ExactScalable(spark, sf)
      .orderBy("l_returnflag").collect().toSeq
    assert(b == a)
  }
}
