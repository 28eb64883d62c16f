package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.{CacheScope, SparkSpec, Tables}
import graft.operators.DedupOps

/** The streaming admission path must reproduce the batch
  * `dedup_incremental` decision for every increment doc, fed across
  * multiple micro-batches against the same static corpus artifacts.
  */
class IncrementalAdmitSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streaming admit == batch dedup_incremental on the same split, across 3 batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter($"doc_id" % 13 =!= 0)
    val bands = DedupOps.corpusBands(corpus)
    val shs = DedupOps.corpusShingleSets(corpus)
    val increment = docs.filter($"doc_id" % 13 === 0)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    assert(increment.length > 10)

    val input = MemoryStream[(Long, String)]
    val out = IncrementalAdmit.admitStream(
      input.toDS().toDF("doc_id", "text"), bands, shs)
    val qn = s"admit_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qn).outputMode("update").start()
    try {
      increment.grouped(math.max(1, increment.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table(qn).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
        .toMap
      val batch = DedupOps.dedupIncremental(spark, sf).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))))
        .toMap
      assert(streamed.keySet == batch.keySet,
        s"doc sets differ: ${streamed.keySet.diff(batch.keySet).take(5)} / ${batch.keySet.diff(streamed.keySet).take(5)}")
      batch.foreach { case (id, b) =>
        assert(streamed(id) == b, s"doc $id: streaming ${streamed(id)} vs batch $b")
      }
      // and the decision is meaningful: the synthetic corpus contains
      // near-dups, so both admitted and rejected docs must occur
      assert(batch.values.exists(_._4) && batch.values.exists(!_._4),
        "split must produce both admitted and rejected docs")
    } finally {
      q.stop()
      CacheScope.release()
    }
  }
}
