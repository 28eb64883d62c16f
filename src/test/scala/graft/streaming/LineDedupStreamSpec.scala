package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming chunk dedup must apply first-occurrence ownership ACROSS
  * micro-batches (the cross-batch state is the point — within a batch
  * the batch twin already covers it).
  */
class LineDedupStreamSpec extends SparkSpec {

  test("a chunk streamed in batch 1 is suppressed from docs in later batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val out = LineDedupStream.lineDedupStream(
      input.toDS().toDF("doc_id", "text"), chunkWords = 2)
    val qn = s"linededup_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qn)
      .outputMode("update").start()
    try {
      input.addData((1L, "a b c d"))
      q.processAllAvailable()
      input.addData((2L, "a b e f"), (3L, "c d"))
      q.processAllAvailable()
      // latest update per doc wins
      val rows = spark.table(qn).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
        .groupBy(_._1).map { case (k, v) => k -> v.last._2 }
      assert(rows(1L) == ((2L, "a b c d")), s"doc 1 owns both chunks: ${rows(1L)}")
      assert(rows(2L) == ((1L, "e f")), s"doc 2 must lose 'a b': ${rows(2L)}")
      // doc 3's only chunk is owned by doc 1 -> no kept chunks; Update
      // mode emits nothing for an empty group, so doc 3 is absent
      assert(!rows.contains(3L), s"doc 3 must be fully suppressed: $rows")
    } finally {
      q.stop()
    }
  }
}
