package graft

import org.apache.spark.sql.functions._
import graft.operators.MergeOps

/** Upsert / changelog-apply semantics that the DuckDB oracle can't cover:
  * delete ops, latest-per-key collapse, and row-level (not column-level)
  * update precedence.
  */
class MergeOpsSpec extends SparkSpec {

  private def base = {
    val s = spark
    import s.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "v")
  }

  test("upsert: update wins wholesale, insert appends, untouched rows survive") {
    val s = spark
    import s.implicits._
    val updates = Seq((2L, "B", 99.0), (4L, "d", 40.0)).toDF("id", "name", "v")
    val out = MergeOps.upsert(base, updates, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set((1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0),
      (4L, "d", 40.0)))
  }

  test("upsert: a null NON-key column in an update row wins (row-level semantics)") {
    val s = spark
    import s.implicits._
    val updates = Seq((1L, null.asInstanceOf[String], 11.0)).toDF("id", "name", "v")
    val out = MergeOps.upsert(base, updates, Seq("id"))
      .filter(col("id") === 1L).collect().head
    assert(out.isNullAt(1) && out.getDouble(2) == 11.0)
  }

  test("null-key update rows are dropped, not surfaced as all-null rows") {
    val s = spark
    import s.implicits._
    val updates = Seq((Some(2L), "B", 99.0), (None, "ghost", 1.0))
      .toDF("id", "name", "v")
    val out = MergeOps.upsert(base, updates, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set((1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0)))
  }

  test("applyChangelog: latest seq wins per key; delete drops; stale delete loses") {
    val s = spark
    import s.implicits._
    val log = Seq(
      (2L, "b2", 21.0, "upsert", 1L),  // superseded by seq=3 below
      (2L, "b3", 22.0, "upsert", 3L),
      (3L, "c", 0.0, "delete", 2L),    // deletes id=3
      (4L, "d", 40.0, "delete", 1L),   // delete then re-insert: upsert is later
      (4L, "d", 41.0, "upsert", 2L),
      (5L, "e", 50.0, "upsert", 1L)    // plain insert
    ).toDF("id", "name", "v", "op", "seq")
    val out = MergeOps.applyChangelog(base, log, Seq("id"), "op", "seq")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set((1L, "a", 10.0), (2L, "b3", 22.0), (4L, "d", 41.0),
      (5L, "e", 50.0)))
  }

  test("q25 plans broadcast joins for supplier/nation/region") {
    val p = SparkEntry.queries("q25_local_supplier")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3,
      s"dimension paths must broadcast:\n$p")
  }
}
