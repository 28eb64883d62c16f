package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.MergeOps

/** The streaming SCD2 maintainer must equal the batch twin's CLOSED
  * intervals when a changelog replays in timestamp order across
  * micro-batch boundaries, including a boundary that lands mid-key
  * (the open interval carried in state closes a batch later).
  */
class Scd2StreamSpec extends SparkSpec {

  // (key, attr, us, tie) — key 1 changes across the batch split; key 2's
  // consecutive duplicate must collapse; key 3 never changes (no closed
  // rows at all); key 4 appears only in batch 2
  private val batch1 = Seq(
    (1L, "a", 100L, 0L), (1L, "b", 200L, 1L),
    (2L, "x", 150L, 2L), (2L, "x", 250L, 3L),
    (3L, "q", 120L, 4L))
  private val batch2 = Seq(
    (1L, "c", 300L, 5L), (1L, "c", 350L, 6L),
    (2L, "y", 400L, 7L),
    (4L, "n", 500L, 8L))

  test("streamed closed intervals equal the batch twin across a mid-key batch split") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, String, Long, Long)]
    val out = Scd2Stream.scd2Stream(
      input.toDS().toDF("user_id", "event_type", "us", "event_id"))
    val qn = s"scd2_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table(qn).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getBoolean(5))).toSet

      val batchDf = (batch1 ++ batch2)
        .toDF("user_id", "event_type", "us", "event_id")
      val expected = MergeOps.scd2(batchDf, "user_id", "event_type", "us", "event_id")
        .filter(!org.apache.spark.sql.functions.col("is_current"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getBoolean(5))).toSet

      assert(expected.nonEmpty, "fixture must close at least one interval")
      assert(streamed == expected,
        s"stream/batch divergence: only-stream=${streamed -- expected}, " +
          s"only-batch=${expected -- streamed}")
    } finally q.stop()
  }

  test("late cross-batch record is dropped; closed history stays immutable") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, String, Long, Long)]
    val out = Scd2Stream.scd2Stream(
      input.toDS().toDF("user_id", "event_type", "us", "event_id"))
    val qn = s"scd2late_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    try {
      input.addData((7L, "a", 100L, 0L), (7L, "b", 200L, 1L))
      q.processAllAvailable()
      // ts=50 predates the open interval (b @ 200): must not emit or
      // corrupt state
      input.addData((7L, "z", 50L, 2L))
      q.processAllAvailable()
      input.addData((7L, "c", 300L, 3L))
      q.processAllAvailable()
      val rows = spark.table(qn).collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(rows == Set(("a", 100L, 200L, 1L), ("b", 200L, 300L, 2L)),
        s"late record must vanish: $rows")
    } finally q.stop()
  }
}
