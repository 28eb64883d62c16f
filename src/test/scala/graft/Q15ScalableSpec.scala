package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** The two-pass histogram-refinement exact percentile (round-9 verdict
  * #6) must reproduce `percentile`'s interpolated values exactly — the
  * cross-engine gate checks it against DuckDB `quantile_cont`; this pins
  * the in-engine identity against Spark's own aggregate at test SF, so a
  * refactor that breaks rank location or interpolation fails fast
  * without the driver. Round 11 adds the occupancy guard's three
  * branches on crafted pathological distributions with a tiny bound.
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

  private val ps = Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99))

  /** (g, nm, v) rows from the scalable core vs Spark's exact
    * `percentile` aggregate on the same frame, both rounded to 6. */
  private def checkAgainstPercentile(df: org.apache.spark.sql.DataFrame,
                                     maxOccupancy: Long): Unit = {
    val got = Relational.exactPercentilesScalable(df, ps,
        maxOccupancy = maxOccupancy)
      .select(col("g"), col("nm"), round(col("v"), 6).as("v"))
      .orderBy("g", "nm").collect().toSeq
    val want = df.groupBy(col("g"))
      .agg(expr("percentile(x, array(0.5, 0.9, 0.99))").as("p"))
      .select(col("g"), explode(arrays_zip(
        array(ps.map { case (nm, _) => lit(nm) }: _*), col("p"))).as("z"))
      .select(col("g"), col("z.0").as("nm"), round(col("z.p"), 6).as("v"))
      .orderBy("g", "nm").collect().toSeq
    assert(got == want, s"\ngot  $got\nwant $want")
    spark.catalog.clearCache(); CacheScope.release()
  }

  test("occupancy guard: 99%-of-mass-in-one-bucket recurses one level and stays exact") {
    import spark.implicits._
    // 990 distinct values packed into ~1/4000 of the range (one level-1
    // bucket) + 10 spread outliers pinning the range: level-1 occupancy
    // 990 > bound 50, but one refinement level re-spreads them
    val dense = (0 until 990).map(i => ("a", 500.0 + i * 1e-4))
    val spread = (0 until 10).map(i => ("a", i * 111.0))
    val df = (dense ++ spread).toDF("g", "x")
    checkAgainstPercentile(df, maxOccupancy = 50L)
  }

  test("occupancy guard: a point-mass group resolves without sorting") {
    import spark.implicits._
    // 99% identical values — no histogram depth can split them, but a
    // single-value sub-bucket needs no sort: the value at every rank
    // inside IS the value. Mixed with a normal group to exercise both
    // paths in one plan.
    val mass = (0 until 990).map(_ => ("a", 42.0))
    val tail = (0 until 10).map(i => ("a", 1000.0 + i))
    val normal = (0 until 200).map(i => ("b", i.toDouble))
    val df = (mass ++ tail ++ normal).toDF("g", "x")
    checkAgainstPercentile(df, maxOccupancy = 50L)
  }

  test("occupancy guard: unsplittable multi-value mass fails loudly naming q15_approx") {
    import spark.implicits._
    // 400 DISTINCT values inside a 4e-7-of-range sliver (level-2 bucket
    // width is range/4096² ≈ 6e-8·range): even one refinement level
    // leaves a multi-value sub-bucket over the bound — the honest
    // failure, with the sketch tier named
    val dense = (0 until 400).map(i => ("a", 500.0 + i * 1e-8))
    val spread = (0 until 10).map(i => ("a", i * 111.0))
    val df = (dense ++ spread).toDF("g", "x")
    val e = intercept[IllegalStateException](
      Relational.exactPercentilesScalable(df, ps, maxOccupancy = 50L)
        .collect())
    assert(e.getMessage.contains("q15_approx"))
    assert(e.getMessage.contains("refinement"))
    spark.catalog.clearCache(); CacheScope.release()
  }
}
