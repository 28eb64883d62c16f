package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.LogRecord

/** Exact windowed deduplication — the Spark-native re-implementation of the
  * reference's `DeduplicationTransformer` (SURVEY.md §2.4; reference
  * `KStreamDistinct.java:42-112`):
  *
  *   - dedup id = `event.exception.exception_class`; records with no id
  *     pass through untouched (`KStreamDistinct.java:71-72`),
  *   - a record is a duplicate iff the store holds a timestamp within
  *     ±window/2 of its event time (`:88-91`),
  *   - duplicates are suppressed AND refresh the stored timestamp
  *     (`:75-77, 97-99`) — continuous duplicates extend suppression,
  *   - state expires after `retention` (10 min default, `:135-141`), so an
  *     id re-emits after quiescence: bounded-memory dedup, not global
  *     distinct.
  *
  * Implementation: event-time stateful processing via
  * `flatMapGroupsWithState` with one `Long` of state per live id (the
  * analogue of the reference's `WindowStore<E, Long>` with
  * `retainDuplicates=false`, which also holds exactly one timestamp per id).
  * State is hash-partitioned by id across executors — the same distribution
  * Kafka Streams gets from key-partitioned topics, but re-shardable by
  * `spark.sql.shuffle.partitions` instead of fixed topic partitions. At
  * 100 TB / high key cardinality, state per executor = |live ids| / shards ×
  * 8 bytes, checkpointed incrementally (RocksDB provider recommended —
  * `spark.sql.streaming.stateStore.providerClass`).
  *
  * Watermark honesty (documented divergence, SURVEY.md §2.5): rows later
  * than the watermark are dropped by Spark before reaching the operator,
  * whereas Kafka Streams processes arbitrarily late records. Within the
  * watermark the two-sided probe is reproduced by comparing |t_stored − t|.
  */
object DedupStream {

  val DefaultWindowUs: Long = 10L * 60 * 1000000 // 10 min, reference :135
  val DefaultRetentionUs: Long = 10L * 60 * 1000000

  private def idOf(r: LogRecord): String =
    r.event.flatMap(_.exception).flatMap(_.exception_class).orNull

  /** Per-key, per-micro-batch transition function. Events in a batch are
    * processed in event-time order (the reference sees them in offset
    * order; for in-order streams these agree — out-of-order records within
    * a batch are handled deterministically by the sort).
    */
  private def transition(windowUs: Long, retentionUs: Long)(
      id: String, rows: Iterator[LogRecord],
      state: GroupState[Long]): Iterator[LogRecord] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val sorted = rows.toSeq.sortBy(_.event_time_us)
      var last: Option[Long] = state.getOption
      val out = sorted.iterator.filter { r =>
        val isDup = last.exists(l => math.abs(r.event_time_us - l) <= windowUs / 2)
        last = Some(r.event_time_us) // store/refresh in both branches (:77, :80)
        !isDup
      }.toVector
      last.foreach { l =>
        state.update(l)
        if (state.getOption.isDefined) {
          // expire retention past the newest stored timestamp (ms precision)
          try state.setTimeoutTimestamp(l / 1000 + retentionUs / 1000)
          catch { case _: UnsupportedOperationException => () } // batch mode
        }
      }
      out.iterator
    }
  }

  /** Dedup a LogRecord stream (or batch Dataset — same code path, state
    * machinery inert). Null-id records bypass the stateful operator
    * entirely (no shuffle for them beyond the union).
    */
  def dedupLogRecords(ds: Dataset[LogRecord],
                      windowUs: Long = DefaultWindowUs,
                      retentionUs: Long = DefaultRetentionUs): Dataset[LogRecord] = {
    import ds.sparkSession.implicits._
    val withTs = ds
      .withColumn("__ts", timestamp_micros(col("event_time_us")))
      .withWatermark("__ts", "10 minutes")
    val hasId = withTs
      .filter(col("event.exception.exception_class").isNotNull)
      .as[LogRecord]
    val noId = withTs
      .filter(col("event.exception.exception_class").isNull)
      .drop("__ts") // union partner must match the operator's clean schema
      .as[LogRecord]
    val deduped = hasId
      .groupByKey(idOf)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        transition(windowUs, retentionUs))
    deduped.union(noId)
  }

  /** Tier-1 approximate dedup for arbitrary DataFrames: built-in
    * watermarked drop-duplicates (one-sided window, no refresh-on-dup —
    * SURVEY.md §2.4 notes the semantic differences). One line, fully
    * incremental, RocksDB-backed.
    */
  def dedupApprox(df: DataFrame, tsCol: String, keyCols: Seq[String],
                  watermark: String = "10 minutes"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
}
