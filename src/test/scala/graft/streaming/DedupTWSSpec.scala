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
}
