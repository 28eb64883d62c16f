package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Bottom-k sampling: order- and batching-invariant (the property that
  * makes it the reproducible reservoir), duplicate-safe, uniform over
  * the distinct item set.
  */
class SampleStreamSpec extends SparkSpec {

  private def feed(batches: Seq[Seq[String]], k: Int): Seq[String] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val qn = s"sample_${System.nanoTime()}"
    val q = SampleStream.bottomK(input.toDS(), k)
      .writeStream.format("memory").queryName(qn).outputMode("complete").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(qn).as[Seq[String]].collect().head
    } finally q.stop()
  }

  test("stream sample == batch twin, regardless of batch boundaries and order") {
    val items = (1 to 300).map(i => s"doc$i")
    val expected = SampleStream.bottomKBatch(items, 20)
    val asOne = feed(Seq(items), 20)
    val asThree = feed(items.grouped(100).toSeq, 20)
    val shuffled = feed(Seq(new scala.util.Random(1).shuffle(items)), 20)
    assert(asOne == expected && asThree == expected && shuffled == expected)
  }

  test("duplicates don't consume extra sample slots") {
    val items = (1 to 50).map(i => s"x$i")
    val dups = items ++ items ++ items
    assert(feed(Seq(dups), 10) == SampleStream.bottomKBatch(items, 10))
  }

  test("sample of fewer-than-k distinct items is the full distinct set") {
    val got = feed(Seq(Seq("a", "b", "a", "c")), 10)
    assert(got.toSet == Set("a", "b", "c") && got.length == 3)
  }

  test("weighted sampler == batch twin across batches; weights tilt inclusion") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // half the pool at weight 1, half at weight 20
    val items = (1 to 200).map(i => (s"doc$i", if (i % 2 == 0) 20.0 else 1.0))
    val expected = SampleStream.bottomKWeightedBatch(items, 30)
    val input = MemoryStream[(String, Double)]
    val qn = s"wsample_${System.nanoTime()}"
    val q = SampleStream.bottomKWeighted(input.toDS(), 30)
      .writeStream.format("memory").queryName(qn).outputMode("complete").start()
    try {
      items.grouped(70).foreach { b => input.addData(b); q.processAllAvailable() }
      val got = spark.table(qn).as[Seq[String]].collect().head
      assert(got == expected)
      // heavy items should dominate the sample (p ~ w: expect >> 15 of 30)
      val heavy = got.count(d => d.stripPrefix("doc").toInt % 2 == 0)
      assert(heavy >= 22, s"weight-20 items underrepresented: $heavy of 30")
    } finally q.stop()
  }

  test("rank is stable and spreads (no catastrophic FNV clustering on doc ids)") {
    val ranks = (1 to 10000).map(i => SampleStream.rank(s"doc$i"))
    assert(ranks.distinct.length == ranks.length, "rank collisions")
    // crude uniformity: each quartile of the sorted sample-by-rank top-1000
    // draws from the whole id range
    val top = ranks.zipWithIndex.sortBy(_._1).take(1000).map(_._2)
    assert(top.count(_ < 5000) > 350 && top.count(_ >= 5000) > 350)
  }
}
