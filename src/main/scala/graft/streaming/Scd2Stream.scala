package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD type-2 maintenance — the stateful twin of the batch
  * `MergeOps.scd2`: one (attr, valid_from, version) triple of state per
  * key holds the OPEN interval; when a change arrives, the open interval
  * closes and is emitted downstream (Append mode emits each closed row
  * exactly once, the batch the superseding change arrives in). The open
  * row lives only in state — a sink that wants it materializes it from
  * the final checkpoint or unions the batch twin's `is_current` slice.
  *
  * This is the reference's per-key state-store topology
  * (KStreamDistinct.java:136-142 — state deciding emit/suppress per
  * record) applied to dimension maintenance: suppress consecutive
  * duplicates, emit on change.
  *
  * Ordering: within a micro-batch, records sort by (ts, tie) before
  * folding — same total order as the batch twin's window sort — so
  * replaying a changelog in timestamp order across any batch boundaries
  * reproduces the batch history row-for-row (Scd2StreamSpec asserts it).
  * A cross-batch LATE record (ts below the open interval's start) is
  * dropped: closed history is immutable in Append mode. Deployments with
  * real late data bound it the way `DedupStream` does — watermark the
  * event time and widen the fold to a buffered window.
  *
  * State: one small fixed-size triple per key — bounded by key
  * cardinality, not stream length, the same budget as the reference's
  * windowed-distinct store.
  */
object Scd2Stream {

  /** `events`: streaming frame with (key, attr, us, tie) — long key,
    * string attribute, epoch-µs long timestamp, long tiebreak. Emits
    * CLOSED intervals (key, attr, valid_from_us, valid_to_us, version,
    * is_current=false) in Append mode.
    */
  def scd2Stream(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.as[(Long, String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: Long, it: Iterator[(Long, String, Long, Long)],
         state: GroupState[(String, Long, Long)]) =>
          val sorted = it.toArray.sortBy(r => (r._3, r._4))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, String, Long, Long, Long, Boolean)]
          var cur = state.getOption
          sorted.foreach { case (_, a, us, _) =>
            cur match {
              case None => cur = Some((a, us, 1L))
              case Some((_, from, _)) if us < from => () // late arrival: drop
              case Some((a0, from, v)) if a0 != a =>
                out += ((k, a0, from, us, v, false))
                cur = Some((a, us, v + 1))
              case _ => () // consecutive duplicate state: collapse
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
      .toDF("user_id", "event_type", "valid_from_us", "valid_to_us",
        "version", "is_current")
  }
}
