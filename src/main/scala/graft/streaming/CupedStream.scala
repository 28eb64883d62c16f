package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, ValueState}

/** One experiment observation on the stream; `pre` marks pre-experiment
  * (covariate) activity vs experiment-period activity.
  */
case class CupedEvent(event_type: String, user_id: Long, value: Double,
                      pre: Boolean)

/** A live CUPED readout row for one metric (the batch `ev_ab_cuped` row). */
case class CupedReadout(event_type: String, n_a: Long, n_b: Long,
                        theta: Double, mean_a_adj: Double, mean_b_adj: Double,
                        t_cuped: Double, var_red: Double)

/** Per-user covariate pair (exact milli-grid sums). */
private[streaming] case class UserXY(x: Long, y: Long)

/** The per-arm exact moments the CUPED finalization is derived from. */
private[streaming] case class CupedMoments(
    na: Long, nb: Long,
    sxa: Long, sxb: Long, sya: Long, syb: Long,
    sxxa: Long, sxxb: Long, syya: Long, syyb: Long,
    sxya: Long, sxyb: Long)

/** Streaming CUPED monitor — the streaming face of the batch
  * `ev_ab_cuped`. CUPED's second moments are over PER-USER sums, so a
  * flat fold over events can't maintain them: when a user's running
  * (X, Y) changes, their squared/cross contributions must be REPLACED,
  * not appended. The processor therefore keeps two pieces of managed
  * state per metric key:
  *
  *   - `users`: a MapState user_id → (X, Y) running covariate pair;
  *   - `moments`: the twelve per-arm BIGINT moments, maintained
  *     incrementally by subtracting a user's old contribution and adding
  *     the new one on every update — O(1) per record, exact integers, so
  *     arrival order and batch boundaries are irrelevant and the readout
  *     after any prefix equals the batch operator on that prefix BIT FOR
  *     BIT (the finalization mirrors the batch expressions op for op).
  *
  * Scale note: keying by metric serializes each metric's map updates
  * through one task (state size = |users| entries — the same information
  * the batch op shuffles). A production deployment shards the key to
  * (metric, user_id % K) and merges the K moment rows at read time —
  * the moments are additive, so the merge is exact; the single-key form
  * here keeps the twin minimal.
  */
class CupedProcessor
    extends StatefulProcessor[String, CupedEvent, CupedReadout] {
  @transient private var users: MapState[Long, UserXY] = _
  @transient private var st: ValueState[CupedMoments] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    users = getHandle.getMapState[Long, UserXY]("users",
      Encoders.scalaLong, Encoders.product[UserXY],
      org.apache.spark.sql.streaming.TTLConfig.NONE)
    st = getHandle.getValueState[CupedMoments]("moments",
      Encoders.product[CupedMoments],
      org.apache.spark.sql.streaming.TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[CupedEvent],
                               timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[CupedReadout] = {
    var m = if (st.exists()) st.get()
      else CupedMoments(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
    rows.foreach { e =>
      val vq = AbStatsStream.milliQuantize(e.value)
      val old = if (users.containsKey(e.user_id)) users.getValue(e.user_id) else null
      val (x0, y0, isNew) =
        if (old == null) (0L, 0L, true) else (old.x, old.y, false)
      val x1 = if (e.pre) x0 + vq else x0
      val y1 = if (e.pre) y0 else y0 + vq
      users.updateValue(e.user_id, UserXY(x1, y1))
      val (dx, dy) = (x1 - x0, y1 - y0)
      val (dxx, dyy, dxy) =
        (x1 * x1 - x0 * x0, y1 * y1 - y0 * y0, x1 * y1 - x0 * y0)
      m = if (e.user_id % 2 == 0)
        m.copy(na = m.na + (if (isNew) 1 else 0),
          sxa = m.sxa + dx, sya = m.sya + dy,
          sxxa = m.sxxa + dxx, syya = m.syya + dyy, sxya = m.sxya + dxy)
      else
        m.copy(nb = m.nb + (if (isNew) 1 else 0),
          sxb = m.sxb + dx, syb = m.syb + dy,
          sxxb = m.sxxb + dxx, syyb = m.syyb + dyy, sxyb = m.sxyb + dxy)
    }
    st.update(m)
    CupedStream.finalize(key, m).iterator
  }
}

object CupedStream {

  /** The batch operator's finalization, op-for-op (doubles bit-identical
    * with `EventOps.evAbCupedOf` on the same moments); None when the
    * batch row would be filtered.
    */
  def finalize(key: String, m: CupedMoments): Option[CupedReadout] = {
    if (m.na <= 1 || m.nb <= 1) return None
    val n = (m.na + m.nb).toDouble
    val sx = (m.sxa + m.sxb).toDouble
    val sy = (m.sya + m.syb).toDouble
    val thn = n * (m.sxya + m.sxyb).toDouble - sx * sy
    val thd = n * (m.sxxa + m.sxxb).toDouble - sx * sx
    val syyd = n * (m.syya + m.syyb).toDouble - sy * sy
    if (!(thd > 0) || !(syyd > 0)) return None
    val theta = thn / thd
    val aa = m.sya.toDouble / m.na.toDouble -
      theta * (m.sxa.toDouble / m.na.toDouble - sx / n)
    val ab = m.syb.toDouble / m.nb.toDouble -
      theta * (m.sxb.toDouble / m.nb.toDouble - sx / n)
    val da = m.na.toDouble * (m.na - 1).toDouble
    val va = (m.na.toDouble * m.syya.toDouble - m.sya.toDouble * m.sya.toDouble) / da -
      2.0 * theta * (m.na.toDouble * m.sxya.toDouble - m.sxa.toDouble * m.sya.toDouble) / da +
      theta * theta * (m.na.toDouble * m.sxxa.toDouble - m.sxa.toDouble * m.sxa.toDouble) / da
    val db = m.nb.toDouble * (m.nb - 1).toDouble
    val vb = (m.nb.toDouble * m.syyb.toDouble - m.syb.toDouble * m.syb.toDouble) / db -
      2.0 * theta * (m.nb.toDouble * m.sxyb.toDouble - m.syb.toDouble * m.sxb.toDouble) / db +
      theta * theta * (m.nb.toDouble * m.sxxb.toDouble - m.sxb.toDouble * m.sxb.toDouble) / db
    val se2 = va / m.na.toDouble + vb / m.nb.toDouble
    if (!(se2 > 0)) return None
    Some(CupedReadout(key, m.na, m.nb, theta, aa / 1000.0, ab / 1000.0,
      (aa - ab) / math.sqrt(se2), thn * thn / (thd * syyd)))
  }

  def readouts(ds: Dataset[CupedEvent]): Dataset[CupedReadout] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.event_type)
      .transformWithState(new CupedProcessor(),
        TimeMode.None(), OutputMode.Update())
  }
}
