package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec
import graft.model.{ExceptionInfo, LogEvent, LogRecord}

/** Property tests (SURVEY.md §5.2.4): the distributed operator must agree
  * with a single-threaded Scala transcription of the reference algorithm
  * (`KStreamDistinct.java:69-103`) on arbitrary in-order event sequences.
  */
class DedupPropertySpec extends SparkSpec {

  private def checkProp(p: Prop, n: Int = 20): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  private val WindowUs = DedupStream.DefaultWindowUs

  /** Direct transcription of DeduplicationTransformer for in-order input:
    * one stored timestamp per id, refreshed on every record; emit iff no
    * stored timestamp within ±window/2.
    */
  private def referenceModel(events: Seq[LogRecord]): Seq[LogRecord] = {
    val store = scala.collection.mutable.Map[String, Long]()
    events.filter { r =>
      r.event.flatMap(_.exception).flatMap(_.exception_class) match {
        case None => true
        case Some(id) =>
          val dup = store.get(id).exists(l => math.abs(r.event_time_us - l) <= WindowUs / 2)
          store(id) = r.event_time_us
          !dup
      }
    }
  }

  private def rec(id: Option[String], tUs: Long): LogRecord =
    LogRecord(Some("k"),
      Some(LogEvent(id.map(i => ExceptionInfo(Some(i), None, None)),
        1, None, None, None, None, Some("ERROR"), None)),
      tUs)

  private val genEvents: Gen[List[LogRecord]] = for {
    n <- Gen.choose(0, 60)
    ids <- Gen.listOfN(n, Gen.oneOf(Some("A"), Some("B"), Some("C"), None))
    // inter-arrival gaps up to 8 minutes so sequences cross the ±5 min
    // boundary in both directions
    gaps <- Gen.listOfN(n, Gen.choose(0L, 8L * 60 * 1000000))
  } yield {
    val times = gaps.scanLeft(0L)(_ + _).tail
    ids.zip(times).map { case (id, t) => rec(id, t) }
  }

  test("distributed dedup == reference model on arbitrary in-order sequences") {
    val s = spark
    import s.implicits._
    checkProp(Prop.forAll(genEvents) { events =>
      val expect = referenceModel(events)
        .map(r => (r.event.flatMap(_.exception).flatMap(_.exception_class), r.event_time_us))
        .sorted(Ordering.by((x: (Option[String], Long)) => (x._1.getOrElse(""), x._2)))
      val got = DedupStream.dedupLogRecords(spark.createDataset(events))
        .collect().toSeq
        .map(r => (r.event.flatMap(_.exception).flatMap(_.exception_class), r.event_time_us))
        .sorted(Ordering.by((x: (Option[String], Long)) => (x._1.getOrElse(""), x._2)))
      got == expect
    })
  }

  test("batch dedup twin (EventOps.dedupWindowed) agrees on single-key in-order input") {
    val s = spark
    import s.implicits._
    checkProp(Prop.forAll(Gen.listOf(Gen.choose(0L, 6L * 60 * 1000000))) { gaps =>
      val times = gaps.scanLeft(0L)(_ + _).tail
      val events = times.map(t => rec(Some("A"), t))
      val expect = referenceModel(events).map(_.event_time_us).toSet
      val df = spark.createDataset(events).toDF()
        .selectExpr("event.exception.exception_class AS id",
          "event_time_us * 1000 AS ts", "event_time_us AS event_id")
      val got = graft.operators.EventOps
        .dedupWindowed(df, Seq("id"), "ts", "event_id", WindowUs / 2)
        .select("event_id").collect().map(_.getLong(0)).toSet
      got == expect
    })
  }
}
