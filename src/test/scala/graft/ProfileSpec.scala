package graft

import graft.operators.Relational

/** The schema-dynamic profiler: fixed output schema over any input,
  * exact null counts, sane sketch cardinalities, stringified min/max.
  */
class ProfileSpec extends SparkSpec {

  test("profile reports one row per column with exact nulls and correct min/max") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some("a"), Some(1.5)),
      (2L, None, Some(-2.0)),
      (3L, Some("c"), None)
    ).toDF("id", "name", "v")
    val p = Relational.profile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toMap
    assert(p.keySet == Set("id", "name", "v"))
    assert(p("id") == (0L, 3L, "1", "3"))
    assert(p("name")._1 == 1L && p("name")._3 == "a" && p("name")._4 == "c")
    assert(p("v")._1 == 1L && p("v")._3 == "-2.0" && p("v")._4 == "1.5")
  }

  test("profile is a single job over the input (no per-column scans)") {
    val s = spark
    import s.implicits._
    val df = spark.range(0, 1000).selectExpr("id", "id % 7 AS k", "CAST(id AS STRING) AS s")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val rows = Relational.profile(df).collect()
    val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length - before
    assert(rows.length == 3)
    assert(jobs <= 2, s"profiler must not scan per column, ran $jobs jobs")
  }
}
