package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The streaming CDC chunk index must equal the batch `doc_cdc_dedup`
  * table on replayed input: stream docs across several micro-batches
  * in Complete mode, compare the final table against the same
  * combinator applied to the docs as one batch frame.
  */
class CdcDedupStreamSpec extends SparkSpec {

  // doc 3 is doc 1 with one word edited early: CDC boundaries are
  // content-derived, so the chunks after the boundary following the edit
  // keep their digests and dedup against doc 1's. Text is long enough
  // (~290 normalized chars) that the 1-in-64 Karp-Rabin boundary rule
  // deterministically yields 3 chunks (129/18/139 chars), with the edit
  // confined to the first.
  private val base =
    "the quick brown fox %s over the lazy dog and then runs far away " +
      "into the deep dark forest before nightfall while seven wizards " +
      "quietly brew magic potions beside the ancient granite bridge as " +
      "autumn leaves drift slowly across the silver river valley under " +
      "a pale crescent moon tonight"
  private val docs = Seq(
    1L -> base.format("jumps"),
    2L -> "completely unrelated text with its own chunk structure here",
    3L -> base.format("LEAPS"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet

  test("streaming chunk index equals the batch twin on replayed input") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Long, String)]
    val out = CdcDedupStream.cdcDedupStream(input.toDS().toDF("doc_id", "text"))
    val qn = s"cdcdedup_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qn)
      .outputMode("complete").start()
    try {
      input.addData(docs.take(1): _*)
      q.processAllAvailable()
      input.addData(docs.drop(1): _*)
      q.processAllAvailable()
      val streamed = rows(spark.table(qn))
      val batch = rows(CdcDedupStream.cdcDedupStream(docs.toDF("doc_id", "text")))
      assert(streamed == batch,
        s"stream/batch divergence: only-stream=${streamed -- batch}, only-batch=${batch -- streamed}")
      // the edit-stability property this operator exists for: doc 3
      // shares at least one cross-batch chunk with doc 1 (count 2,
      // canonical = the first doc to stream it)
      val shared = batch.filter(t => t._2 >= 2 && t._3 == 1L)
      assert(shared.nonEmpty, s"expected chunks shared across the edit: $batch")
    } finally q.stop()
  }
}
