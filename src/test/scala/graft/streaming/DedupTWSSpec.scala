package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.model.{ExceptionInfo, LogEvent, LogRecord}

/** transformWithState variant must reproduce the fMGWS semantics. */
class DedupTWSSpec extends SparkSpec {

  private val Min = 60L * 1000000
  private val Base = 86400L * 1000000

  private def rec(id: String, tUs: Long): LogRecord =
    LogRecord(Some("k"),
      Some(LogEvent(
        Option(id).map(i => ExceptionInfo(Some(i), None, None)),
        1, None, None, None, None, Some("ERROR"), None)),
      Base + tUs)

  test("transformWithState dedup: novel/dup/refresh/null-id semantics") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    StateStores.useRocksDB(spark)
    val input = MemoryStream[LogRecord]
    val out = DedupStreamTWS.dedupLogRecords(input.toDS()).toDF()
    val qn = s"tws_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qn).outputMode("append").start()
    try {
      input.addData(Seq(
        rec("A", 0), rec("A", 4 * Min), rec("A", 8 * Min), // refresh chain
        rec("B", 0), rec(null, 0), rec(null, 1000)))
      q.processAllAvailable()
      input.addData(Seq(rec("A", 14 * Min))) // 6 min past refreshed 8 min → emits
      q.processAllAvailable()
      val got = spark.table(qn)
        .selectExpr("event.exception.exception_class", "event_time_us").collect()
        .map(r => (Option(r.getString(0)).orNull, r.getLong(1))).toSeq
      assert(got.count(_._1 == null) == 2)
      assert(got.filter(_._1 == "A").map(_._2).toSet ==
        Set(Base, Base + 14 * Min))
      assert(got.count(_._1 == "B") == 1)
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("retention expiry drops state: id re-emits after quiescence (reference :135-141)") {
    // window = 40 min (±20 suppression), retention = 10 min — so expiry is
    // OBSERVABLE inside the suppression window: without the event-time
    // timer dropping state, A@20min (|20−0| ≤ 20) would be suppressed.
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    StateStores.useRocksDB(spark)
    val input = MemoryStream[LogRecord]
    val out = DedupStreamTWS.dedupLogRecords(input.toDS(),
      windowUs = 40 * Min, retentionUs = 10 * Min).toDF()
    val qn = s"tws_ret_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qn).outputMode("append").start()
    try {
      input.addData(Seq(rec("A", 0), rec("C", 0)))          // both novel → emit
      q.processAllAvailable()
      // C refreshes its state (watermark still low, timer not yet fired);
      // B advances the watermark to 25−10 = 15 min > A's 10-min expiry
      input.addData(Seq(rec("C", 15 * Min), rec("B", 25 * Min)))
      q.processAllAvailable()
      input.addData(Seq(rec("D", 26 * Min)))                // timer batch: A expires, C (refreshed) survives
      q.processAllAvailable()
      // A re-emits (state dropped after quiescence); C stays suppressed
      // (|20−15| = 5 ≤ 20 against its refreshed, still-live state)
      input.addData(Seq(rec("A", 20 * Min), rec("C", 20 * Min)))
      q.processAllAvailable()
      val got = spark.table(qn)
        .selectExpr("event.exception.exception_class", "event_time_us").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got.filter(_._1 == "A").map(_._2).toSet == Set(Base, Base + 20 * Min),
        s"A must re-emit after retention quiescence: $got")
      assert(got.filter(_._1 == "C").map(_._2) == Seq(Base),
        s"refreshed C must stay suppressed: $got")
      assert(got.count(_._1 == "B") == 1 && got.count(_._1 == "D") == 1)
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
