package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.DedupOps

/** The streaming span detector must equal the batch twin on replayed
  * input: stream a corpus through in doc order across several
  * micro-batches, union the Append-mode output, compare against
  * `DedupOps.spanRemovals` over the same docs as one batch frame.
  */
class SpanDedupStreamSpec extends SparkSpec {

  private val docs = Seq(
    1L -> "a b c d e",  // owns spans (a b c)(b c d)(c d e)
    2L -> "x y z w",    // owns (x y z)(y z w)
    3L -> "a b c q r",  // pos 0 duplicates doc 1's claim — cross-batch
    4L -> "x y z",      // its only span duplicates doc 2 — cross-batch
    5L -> "a b c",      // duplicates doc 1 again — same batch as doc 3
    6L -> "p q")        // below w tokens: no spans at all
  private val w = 3

  test("streaming removal list equals the batch twin on replayed input") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val out = SpanDedupStream.spanDedupStream(
      input.toDS().toDF("doc_id", "text"), w)
    val qn = s"spandedup_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    try {
      input.addData(docs.take(2): _*)
      q.processAllAvailable()
      input.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table(qn).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = DedupOps.spanRemovals(docs.toDF("doc_id", "text"), w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(batch.nonEmpty, "fixture must produce duplicate spans")
      assert(streamed == batch,
        s"stream/batch divergence: only-stream=${streamed -- batch}, only-batch=${batch -- streamed}")
    } finally q.stop()
  }

  test("a span claimed in batch 1 stays claimed: later batches emit removals only") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val out = SpanDedupStream.spanDedupStream(
      input.toDS().toDF("doc_id", "text"), w)
    val qn = s"spandedup_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    try {
      input.addData(1L -> "a b c d")
      q.processAllAvailable()
      assert(spark.table(qn).count() == 0, "first occurrences are not removals")
      // replay the identical doc under a new id: every span is now a dup
      input.addData(7L -> "a b c d")
      q.processAllAvailable()
      val rows = spark.table(qn).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((7L, 0L), (7L, 1L)), s"expected both spans of doc 7 removed: $rows")
    } finally q.stop()
  }
}
