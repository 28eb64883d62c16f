package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end "prepare a training corpus" composition — exact dedup
  * → quality gate → stratified sample — as ONE oracle-gated query.
  * CorpusPipelineSpec exercises a richer composition behaviorally; this
  * entry proves the operators compose with cross-engine EXACTNESS (the
  * three stages are each hash-green individually; their join is too).
  *
  * Scale shape inherits from the parts: dedup shuffles digests, the
  * quality gate and sample are scan-fused projections, and the final
  * joins are id-equijoins AQE sizes (all three sides are already
  * id-keyed, so bucketing the corpus by doc_id makes the whole pipeline
  * exchange-free after the dedup shuffle).
  */
object CorpusPipeline {

  def corpusPrepared(spark: SparkSession, sfDir: String): DataFrame = {
    val canonical = DedupOps.dedupExact(spark, sfDir)
      .select(col("canonical_id").as("doc_id"))
    val quality = TextOps.docQuality(spark, sfDir)
      .filter(col("n_tokens") >= 20 && col("uniq_ratio") >= 0.2)
      .select(col("doc_id"), col("n_tokens"))
    val sampled = SampleOps.docSampleStrat(spark, sfDir)
      .select(col("doc_id"), col("lang"))
    canonical
      .join(quality, Seq("doc_id"))
      .join(sampled, Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("n_tokens"))
  }

  /** Observed variant: per-stage row counters via `Dataset.observe` —
    * the production-monitoring surface. Observations are computed
    * INSIDE the job (accumulator-backed, zero extra scans or actions,
    * unlike a `count()` per stage which would re-run the lineage) and
    * read after any action on the returned frame. The same calls work
    * under Structured Streaming, where the metrics surface per batch in
    * `StreamingQueryProgress.observedMetrics`.
    */
  def corpusPreparedObserved(spark: SparkSession, sfDir: String):
      (DataFrame, Map[String, org.apache.spark.sql.Observation]) = {
    import org.apache.spark.sql.Observation
    val obs = Map(
      "canonical" -> Observation("canonical"),
      "quality" -> Observation("quality"),
      "prepared" -> Observation("prepared"))
    val canonical = DedupOps.dedupExact(spark, sfDir)
      .select(col("canonical_id").as("doc_id"))
      .observe(obs("canonical"), count(lit(1)).as("rows"))
    val quality = TextOps.docQuality(spark, sfDir)
      .filter(col("n_tokens") >= 20 && col("uniq_ratio") >= 0.2)
      .select(col("doc_id"), col("n_tokens"))
      .observe(obs("quality"), count(lit(1)).as("rows"))
    val sampled = SampleOps.docSampleStrat(spark, sfDir)
      .select(col("doc_id"), col("lang"))
    val out = canonical
      .join(quality, Seq("doc_id"))
      .join(sampled, Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("n_tokens"))
      .observe(obs("prepared"), count(lit(1)).as("rows"),
        avg(col("n_tokens")).as("avg_tokens"))
    (out, obs)
  }

  val corpusPreparedSql: String =
    """WITH canon AS (
      |  SELECT min(doc_id) AS doc_id FROM documents
      |  GROUP BY md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))),
      |q AS (
      |  SELECT doc_id, len(t) AS n_tokens,
      |    round(len(list_distinct(t))::DOUBLE / len(t), 4) AS uniq_ratio
      |  FROM (SELECT doc_id,
      |          string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
      |        FROM documents)),
      |s AS (
      |  SELECT doc_id, lang FROM (
      |    SELECT doc_id, lang,
      |      ('0x' || substr(md5('smp|' || doc_id), 1, 8))::BIGINT % 100 AS bucket
      |    FROM documents)
      |  WHERE bucket < CASE WHEN lang = 'en' THEN 10 ELSE 50 END)
      |SELECT canon.doc_id, s.lang, q.n_tokens
      |FROM canon JOIN q USING (doc_id) JOIN s USING (doc_id)
      |WHERE q.n_tokens >= 20 AND q.uniq_ratio >= 0.2""".stripMargin
}
