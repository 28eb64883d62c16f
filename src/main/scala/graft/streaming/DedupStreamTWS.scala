package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import graft.model.LogRecord

/** The same exact dedup semantics as [[DedupStream]] on Spark 4.x's
  * `transformWithState` API (`StatefulProcessor` — the direct analogue of
  * the Kafka Streams Processor API the reference uses, SURVEY.md §2.4).
  * State: one `ValueState[Long]` per live id — the `WindowStore<E, Long>`
  * twin. Retention (reference `KStreamDistinct.java:135-141`, 10 min) is
  * an event-time timer registered past the newest stored timestamp; on
  * expiry the state is dropped iff no refresh happened since — so an id
  * re-emits after quiescence and live-id state is bounded, exactly like
  * the windowed store's expiry. Requires the RocksDB state store provider
  * (Spark enforces this for transformWithState).
  */
class DedupProcessor(windowUs: Long,
                     retentionUs: Long = DedupStream.DefaultRetentionUs)
    extends StatefulProcessor[String, LogRecord, LogRecord] {
  @transient private var lastSeen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    lastSeen = getHandle.getValueState[Long]("lastSeen", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[LogRecord],
                               timerValues: TimerValues): Iterator[LogRecord] = {
    val sorted = rows.toSeq.sortBy(_.event_time_us)
    var last: Option[Long] = if (lastSeen.exists()) Some(lastSeen.get()) else None
    val out = sorted.filter { r =>
      val dup = last.exists(l => math.abs(r.event_time_us - l) <= windowUs / 2)
      last = Some(r.event_time_us) // store/refresh in both branches
      !dup
    }
    last.foreach { l =>
      lastSeen.update(l)
      getHandle.registerTimer(l / 1000 + retentionUs / 1000) // ms precision
    }
    out.iterator
  }

  /** Retention expiry: stale timers (the key was refreshed after this
    * timer was set) are ignored; a timer at/after last-seen + retention
    * drops the state so the id re-emits on its next occurrence.
    */
  override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                  expiredTimerInfo: ExpiredTimerInfo): Iterator[LogRecord] = {
    if (lastSeen.exists() &&
        expiredTimerInfo.getExpiryTimeInMs >= lastSeen.get() / 1000 + retentionUs / 1000) {
      lastSeen.clear()
    }
    Iterator.empty
  }
}

object DedupStreamTWS {

  /** transformWithState-based dedup; same contract as
    * `DedupStream.dedupLogRecords`. Sets the RocksDB state store provider
    * on the session (required by the API; also the right provider for
    * large live-id sets).
    */
  def dedupLogRecords(ds: Dataset[LogRecord],
                      windowUs: Long = DedupStream.DefaultWindowUs,
                      retentionUs: Long = DedupStream.DefaultRetentionUs): Dataset[LogRecord] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val withTs = ds
      .withColumn("__ts", timestamp_micros(col("event_time_us")))
      .withWatermark("__ts", "10 minutes")
    val hasId = withTs
      .filter(col("event.exception.exception_class").isNotNull)
      .as[LogRecord]
    val noId = withTs
      .filter(col("event.exception.exception_class").isNull)
      .drop("__ts")
      .as[LogRecord]
    val deduped = hasId
      .groupByKey(r => r.event.flatMap(_.exception).flatMap(_.exception_class).getOrElse(""))
      .transformWithState(new DedupProcessor(windowUs, retentionUs), TimeMode.EventTime(), OutputMode.Append())
    deduped.union(noId)
  }
}
