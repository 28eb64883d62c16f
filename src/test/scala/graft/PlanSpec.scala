package graft

/** Plan-shape assertions — the `.explain("formatted")` discipline as
  * executable checks. These are the properties SCALE.md claims: filters
  * reach the parquet scan, projections prune columns, small dimensions
  * broadcast, top-k avoids global sorts.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q1_agg pushes the shipdate filter into the parquet scan") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters"), p.take(2000))
    assert(p.contains("LessThanOrEqual(l_shipdate"), p.take(2000))
  }

  test("q1_agg prunes unread columns at the scan") {
    val p = plan("q1_agg")
    assert(!p.contains("l_partkey"), "scan should not read l_partkey")
    assert(!p.contains("l_suppkey"), "scan should not read l_suppkey")
  }

  test("ev_filter pushes the event_type equality") {
    val p = plan("ev_filter")
    assert(p.contains("EqualTo(event_type,error)"), p.take(2000))
  }

  test("q2_join_broadcast broadcasts the dimension tables") {
    val p = plan("q2_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q3_topk plans TakeOrderedAndProject (no global sort)") {
    val p = plan("q3_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("Sort ["), "top-k must not global-sort")
  }

  test("q4_semi_join plans a semi join with a pruned right side") {
    val p = plan("q4_semi_join")
    assert(p.contains("LeftSemi"), p.take(2000))
  }

  test("dedup/sessionize share one exchange for the window functions") {
    val p = plan("ev_sessionize")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected exactly 1 hash exchange, got $exchanges")
  }
}
