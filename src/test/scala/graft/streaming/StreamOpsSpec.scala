package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

case class Click(user: String, ts: Timestamp)
case class Purchase(user: String, pts: Timestamp, amount: Double)

class StreamOpsSpec extends SparkSpec {

  private val H = 3600L * 1000 // one hour in ms
  private val Base = 10 * 86400L * 1000
  private def t(ms: Long) = new Timestamp(Base + ms)

  test("tumbling window count (streaming, append after watermark passes)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Click]
    val out = StreamOps.tumblingCount(in.toDF(), "ts", "user", "1 hour")
    val qn = s"tw_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qn).outputMode("append").start()
    try {
      in.addData(Seq(Click("u1", t(0)), Click("u1", t(10)), Click("u2", t(20))))
      q.processAllAvailable()
      // advance watermark far past the first window so it finalizes
      in.addData(Seq(Click("u9", t(5 * H))))
      q.processAllAvailable()
      val rows = spark.table(qn).select("user", "n").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows == Set(("u1", 2L), ("u2", 1L)))
    } finally q.stop()
  }

  test("sliding window count (streaming): events land in overlapping windows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Click]
    val out = StreamOps.slidingCount(in.toDF(), "ts", "user", "1 hour", "30 minutes")
    val qn = s"sl_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qn).outputMode("append").start()
    try {
      // one event at Base+40min: covered by windows starting at 0:00 and 0:30
      in.addData(Seq(Click("u1", t(40 * 60 * 1000))))
      q.processAllAvailable()
      in.addData(Seq(Click("u9", t(6 * H)))) // advance watermark
      q.processAllAvailable()
      val rows = spark.table(qn).filter($"user" === "u1")
        .select("window_start", "n").collect()
        .map(r => (r.getTimestamp(0).getTime - Base, r.getLong(1))).toSet
      assert(rows == Set((0L, 1L), (30L * 60 * 1000, 1L)))
    } finally q.stop()
  }

  test("session window count (streaming)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Click]
    val out = StreamOps.sessionCount(in.toDF(), "ts", "user", "30 minutes")
    val qn = s"sw_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qn).outputMode("append").start()
    try {
      // u1: two events 10 min apart (one session), then one 2h later (new session)
      in.addData(Seq(Click("u1", t(0)), Click("u1", t(10 * 60 * 1000)),
        Click("u1", t(2 * H))))
      q.processAllAvailable()
      in.addData(Seq(Click("u9", t(9 * H)))) // advance watermark
      q.processAllAvailable()
      val rows = spark.table(qn).filter(col("user") === "u1")
        .select("n").collect().map(_.getLong(0)).sorted.toSeq
      assert(rows == Seq(1L, 2L))
    } finally q.stop()
  }

  test("stream-static enrichment join (broadcast dim, no state store)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = Seq(("u1", "gold"), ("u2", "basic")).toDF("user", "tier")
    val in = MemoryStream[Click]
    val out = StreamOps.enrich(in.toDF(), dim, "user")
    val qn = s"en_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qn).outputMode("append").start()
    try {
      in.addData(Seq(Click("u1", t(0)), Click("u3", t(10))))
      q.processAllAvailable()
      val rows = spark.table(qn).select("user", "tier").collect()
        .map(r => (r.getString(0), Option(r.getString(1)))).toSet
      assert(rows == Set(("u1", Some("gold")), ("u3", None)))
    } finally q.stop()
  }

  test("stream-stream interval join") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Purchase]
    val joined = StreamOps.intervalJoin(
      clicks.toDF(), buys.toDF(), "user", "ts", "pts",
      before = "0 seconds", after = "30 minutes")
      .select(col("user"), col("amount"))
    val qn = s"ssj_${System.nanoTime()}"
    val q = joined.writeStream.format("memory").queryName(qn).outputMode("append").start()
    try {
      clicks.addData(Seq(Click("u1", t(0)), Click("u2", t(0))))
      buys.addData(Seq(
        Purchase("u1", t(10 * 60 * 1000), 9.99), // within 30 min of u1 click
        Purchase("u2", t(2 * H), 5.0))) // too late for u2's click
      q.processAllAvailable()
      val rows = spark.table(qn).collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(rows == Set(("u1", 9.99)))
    } finally q.stop()
  }

  test("approximate dedup tier: dropDuplicatesWithinWatermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Click]
    val out = DedupStream.dedupApprox(in.toDF(), "ts", Seq("user"))
    val qn = s"dda_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(qn).outputMode("append").start()
    try {
      in.addData(Seq(Click("u1", t(0)), Click("u1", t(1000)), Click("u2", t(0))))
      q.processAllAvailable()
      assert(spark.table(qn).select("user").collect().map(_.getString(0)).sorted.toSeq
        == Seq("u1", "u2"))
    } finally q.stop()
  }
}
