package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming Misra-Gries: the aggregation buffer is the sketch state,
  * merged across micro-batches. With capacity >= |distinct| the summary
  * is exact (no decrement ever fires), so the cross-batch result must
  * equal exact batch counts; with small capacity the MG guarantees must
  * hold over the WHOLE stream, not per batch.
  */
class TopKStreamSpec extends SparkSpec {

  private def feed(batches: Seq[Seq[String]], capacity: Int): Seq[(String, Long)] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val qn = s"topk_${System.nanoTime()}"
    val q = TopKStream.topk(input.toDS(), capacity)
      .writeStream.format("memory").queryName(qn).outputMode("complete").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(qn).as[Seq[(String, Long)]].collect().head
    } finally q.stop()
  }

  test("exact when capacity >= distinct: cross-batch state equals batch counts") {
    val batches = Seq(
      Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"),
      Seq.fill(4)("a") ++ Seq.fill(6)("d") ++ Seq("b", "c"))
    val got = feed(batches, capacity = 16)
    assert(got == Seq("a" -> 9L, "d" -> 6L, "b" -> 4L, "c" -> 2L))
  }

  test("small capacity: every true-heavy item survives; estimates undercount") {
    // N = 300, capacity 4 -> anything with count > N/5 = 60 must survive
    val heavy = Seq.fill(120)("hot") ++ Seq.fill(80)("warm")
    val noise = (0 until 100).map(i => s"n${i % 50}")
    val got = feed(Seq(heavy, noise.toList), capacity = 4).toMap
    assert(got.contains("hot") && got.contains("warm"))
    assert(got("hot") <= 120 && got("warm") <= 80, "MG must never overcount")
    assert(got("hot") >= 120 - 300 / 5 && got("warm") >= 80 - 300 / 5)
  }

  test("checkpoint restart: the summary state survives a new query instance") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_topk_ckpt").toString
    val (src, ckpt) = (s"$base/src", s"$base/ckpt")
    val qn = s"topk_ckpt_${System.nanoTime()}"
    def startQuery() =
      TopKStream.topk(
          spark.readStream.schema("item STRING").parquet(src).as[String],
          capacity = 16)
        .writeStream.format("memory").queryName(qn)
        .option("checkpointLocation", ckpt).outputMode("complete").start()

    (Seq.fill(5)("a") ++ Seq.fill(2)("b")).toDF("item").write.parquet(src)
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()

    // new query instance, same checkpoint: counts must CONTINUE, and only
    // the new file may be read (offset log)
    (Seq.fill(4)("b") ++ Seq("c")).toDF("item").write.mode("append").parquet(src)
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      val got = spark.table(qn).as[Seq[(String, Long)]].collect().head
      assert(got == Seq("b" -> 6L, "a" -> 5L, "c" -> 1L),
        s"state lost or reprocessed: $got")
    } finally q2.stop()
  }

  test("per-key summaries stay independent across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val qn = s"topkk_${System.nanoTime()}"
    val q = TopKStream.topkByKey(input.toDS(), capacity = 8)
      .toDF("lang", "topk")
      .writeStream.format("memory").queryName(qn).outputMode("complete").start()
    try {
      input.addData(Seq(("en", "x"), ("en", "x"), ("fr", "y")))
      q.processAllAvailable()
      input.addData(Seq(("en", "x"), ("fr", "z"), ("fr", "z")))
      q.processAllAvailable()
      val got = spark.table(qn).as[(String, Seq[(String, Long)])].collect().toMap
      assert(got("en") == Seq("x" -> 3L))
      assert(got("fr") == Seq("z" -> 2L, "y" -> 1L))
    } finally q.stop()
  }
}
