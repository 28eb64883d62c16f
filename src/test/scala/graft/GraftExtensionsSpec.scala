package graft

import org.scalatest.funsuite.AnyFunSuite

/** The config-driven injection path: the shared test session is built
  * with `spark.sql.extensions=graft.GraftExtensions`, so the native
  * functions must be available to pure SQL with no Graft.init /
  * register call. `newSession()` is the proof that they come from the
  * injected registry and not from some suite's temp-function
  * registration: temp functions do NOT survive newSession(), injected
  * functions do (extensions re-apply to every session built from the
  * same SparkSession).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions registers the native functions") {
    val s = SparkSpec.session.newSession() // temp-function-free registry
    assert(s.sql("SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .head.getDouble(0) == 1.0)
    assert(s.sql("SELECT l2_sq(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS d")
      .head.getDouble(0) == 25.0)
    assert(s.sql("SELECT jaccard_sorted(array(1L, 2L), array(2L, 3L)) AS j")
      .head.getDouble(0) == 1.0 / 3.0)
    assert(s.sql("SELECT size(winnow_fp('abcdefghijklmnop')) AS n")
      .head.getInt(0) > 0)
    assert(s.sql("SELECT intersect_count_sorted(array(1L, 2L, 5L), array(2L, 5L)) AS i")
      .head.getLong(0) == 2L)
    assert(s.sql("SELECT bitmap_and_count(array(3L), array(1L)) AS b")
      .head.getLong(0) == 1L)
    assert(s.sql("SELECT ed_within_1('abc', 'abd') AS e").head.getBoolean(0))
    assert(s.sql("SELECT z_value(5L, 3L) AS z").head.getLong(0) == 27L)
    assert(s.catalog.functionExists("cosine_sim"))
  }
}
