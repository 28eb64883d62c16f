package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode}
import org.apache.spark.sql.streaming.ValueState

/** One metric observation on the stream. */
case class MetricEvent(user_id: Long, event_id: Long, value: Double)

/** A flagged anomaly: the observation and its z-score against the
  * user's statistics as of JUST BEFORE this observation. */
case class AnomalyFlag(user_id: Long, event_id: Long, value: Double, z: Double)

/** Streaming z-score anomaly flags — the streaming face of the batch
  * `ev_anomaly`, with the semantics shift streaming forces: the batch
  * query scores each event against the user's FULL-history mean/stddev,
  * a stream can only score against statistics of what has ARRIVED —
  * each observation is checked against the running Welford aggregate of
  * the prior observations, then folded in. That is the standard online
  * monitoring semantics (an alert system cannot consult the future);
  * the two agree in distribution once a user's history is long.
  *
  * State per user is three doubles (count, mean, M2) — Welford's
  * update, numerically stable and O(1) per record. The first
  * `minPrior` observations of a user are never flagged (a z-score
  * against 1-2 samples is noise).
  */
class AnomalyProcessor(k: Double, minPrior: Long, ttl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[Long, MetricEvent, AnomalyFlag] {
  @transient private var st: ValueState[(Long, Double, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Double, Double)]("welford",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble),
      ttl)

  override def handleInputRows(key: Long, rows: Iterator[MetricEvent],
                               timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[AnomalyFlag] = {
    var (n, mean, m2) = if (st.exists()) st.get() else (0L, 0.0, 0.0)
    val out = scala.collection.mutable.ArrayBuffer[AnomalyFlag]()
    // deterministic in-batch order, like the funnel processor's sort
    rows.toSeq.sortBy(_.event_id).foreach { e =>
      if (n >= minPrior) {
        val sd = math.sqrt(m2 / (n - 1))
        if (sd > 0 && math.abs(e.value - mean) > k * sd)
          out += AnomalyFlag(key, e.event_id, e.value,
            (e.value - mean) / sd)
      }
      n += 1
      val d = e.value - mean
      mean += d / n
      m2 += d * (e.value - mean)
    }
    st.update((n, mean, m2))
    out.iterator
  }
}

object AnomalyStream {

  def flags(ds: Dataset[MetricEvent], k: Double = 3.0,
            minPrior: Long = 10): Dataset[AnomalyFlag] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.user_id)
      .transformWithState(new AnomalyProcessor(k, minPrior),
        TimeMode.None(), OutputMode.Append())
  }

  /** Single-threaded reference model for the suite. */
  def referenceFlags(events: Seq[MetricEvent], k: Double,
                     minPrior: Long): Seq[AnomalyFlag] = {
    val st = scala.collection.mutable.Map[Long, (Long, Double, Double)]()
    val out = scala.collection.mutable.ArrayBuffer[AnomalyFlag]()
    events.foreach { e =>
      var (n, mean, m2) = st.getOrElse(e.user_id, (0L, 0.0, 0.0))
      if (n >= minPrior) {
        val sd = math.sqrt(m2 / (n - 1))
        if (sd > 0 && math.abs(e.value - mean) > k * sd)
          out += AnomalyFlag(e.user_id, e.event_id, e.value, (e.value - mean) / sd)
      }
      n += 1
      val d = e.value - mean
      mean += d / n
      m2 += d * (e.value - mean)
      st(e.user_id) = (n, mean, m2)
    }
    out.toSeq
  }
}
