package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Streaming near-dup admission — the stream-static twin of the batch
  * `dedup_incremental`: documents arrive as a stream, the existing
  * corpus participates through two STATIC stored artifacts (the slim
  * band table and the shingle-set table, refreshed by the batch dedup
  * job), and every micro-batch emits one decision row per incoming doc
  * with semantics identical to the batch operator (band-collision
  * candidates, exact-Jaccard ≥ 0.5 confirm, best-match election).
  *
  * Streaming-specific construction (the batch plan can't run as-is):
  *
  *   - no persist() barriers — a stream row is consumed once, so the
  *     signature chain is inlined (and persist is illegal on streaming
  *     plans anyway);
  *   - candidate dedup can't use `distinct()` (cross-batch state) or
  *     `count(DISTINCT ...)` (unsupported in streaming aggs); instead
  *     `collect_set(struct(-jacc, c_id))` dedups per-doc matches inside
  *     the one aggregation — bounded by the doc's true near-dup count;
  *   - both corpus joins are stream-static LEFT OUTER (stream side
  *     left), so novel docs survive to the aggregation and get their
  *     admit row; static sides broadcast when they fit, and at 100 TB
  *     the band join co-partitions against the stored band table;
  *   - output mode Update: each doc's bands land in one micro-batch, so
  *     its aggregate is final the first time it's emitted. Keyed state
  *     is per-doc and evicted by watermarking an ingest timestamp in a
  *     long-lived deployment (same retention story as DedupStream).
  *
  * Reference: lokeshallam/kafkastreams-example KStreamDistinct.java
  * 136-142 (the windowed-dedup topology this generalizes: per-key state
  * lookup deciding emit/suppress — here the "state" is the corpus).
  */
object IncrementalAdmit {

  /** `docs` must be a streaming frame with (doc_id, text); the two
    * corpus frames are the batch artifacts from
    * [[DedupOps.corpusBands]] / [[DedupOps.corpusShingleSets]].
    */
  def admitStream(docs: DataFrame, corpusBands: DataFrame,
                  corpusShs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val inc = DedupOps.incrementBands(docs)
    val cand = inc
      .join(corpusBands.select(col("doc_id").as("c_id"), col("band"), col("bh")),
        Seq("band", "bh"), "left_outer")
      .join(corpusShs.select(col("doc_id").as("c_id"), col("shset").as("c_sh")),
        Seq("c_id"), "left_outer")
      .withColumn("jacc", when(col("c_sh").isNotNull,
        round(size(array_intersect(col("shset"), col("c_sh"))).cast("double") /
          (size(col("shset")) + size(col("c_sh"))
            - size(array_intersect(col("shset"), col("c_sh")))), 4)))
    cand
      .groupBy(col("doc_id"))
      .agg(collect_set(when(col("jacc") >= threshold,
        struct((-col("jacc")).as("nj"), col("c_id")))).as("ms"))
      .select(col("doc_id"),
        size(col("ms")).cast("long").as("n_dups"),
        coalesce(expr("try_element_at(array_sort(ms), 1).c_id"), lit(-1L)).as("best_match"),
        coalesce(-expr("try_element_at(array_sort(ms), 1).nj"), lit(0.0)).as("best_jacc"),
        (size(col("ms")) === 0).as("admitted"))
  }
}
