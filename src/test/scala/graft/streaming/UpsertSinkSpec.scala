package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** foreachBatch changelog materialization: the parquet table must track
  * upserts and deletes across micro-batches and stay readable (complete,
  * promoted copy) at every batch boundary.
  */
class UpsertSinkSpec extends SparkSpec {

  test("changelog stream maintains the table across batches; deletes and re-upserts apply") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = s"/tmp/graft-upsert-${System.nanoTime()}"
    val path = s"$dir/table"
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "v")
      .write.parquet(path)

    val input = MemoryStream[(Long, String, Double, String, Long)]
    val q = UpsertSink.start(
      input.toDF().toDF("id", "name", "v", "op", "seq"),
      path, Seq("id"), "op", "seq", s"$dir/ckpt")
    try {
      // batch 1: update id=2, insert id=3
      input.addData((2L, "B", 21.0, "upsert", 1L), (3L, "c", 30.0, "upsert", 2L))
      q.processAllAvailable()
      val after1 = spark.read.parquet(path)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(after1 == Set((1L, "a", 10.0), (2L, "B", 21.0), (3L, "c", 30.0)))

      // batch 2: delete id=1, then a same-batch stale delete loses to a
      // later re-upsert of id=3
      input.addData((1L, "x", 0.0, "delete", 3L),
        (3L, "x", 0.0, "delete", 4L), (3L, "c2", 31.0, "upsert", 5L))
      q.processAllAvailable()
      val after2 = spark.read.parquet(path)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(after2 == Set((2L, "B", 21.0), (3L, "c2", 31.0)))

      // promotion hygiene: no _next/_prev leftovers after a clean batch
      assert(!new java.io.File(s"${path}_next").exists())
      assert(!new java.io.File(s"${path}_prev").exists())
    } finally q.stop()
  }

  test("re-applying a batch is idempotent (foreachBatch at-least-once replay)") {
    val s = spark
    import s.implicits._
    val dir = s"/tmp/graft-upsert-idem-${System.nanoTime()}"
    val path = s"$dir/table"
    Seq((1L, "a", 10.0)).toDF("id", "name", "v").write.parquet(path)
    val batch = Seq((1L, "a2", 11.0, "upsert", 1L), (2L, "b", 20.0, "upsert", 2L),
      (3L, "c", 1.0, "delete", 3L)).toDF("id", "name", "v", "op", "seq")
    UpsertSink.applyBatch(spark, batch, path, Seq("id"), "op", "seq")
    val once = spark.read.parquet(path)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    // a failure AFTER the table swap but BEFORE the checkpoint commit makes
    // the engine replay the same batch — the apply must converge
    UpsertSink.applyBatch(spark, batch, path, Seq("id"), "op", "seq")
    val twice = spark.read.parquet(path)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(once == Set((1L, "a2", 11.0), (2L, "b", 20.0)))
    assert(twice == once, "replayed batch must be a no-op")
  }
}
