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

  /** The production-shaped end-to-end chain with keep-BEST canonical
    * selection: near-dup dedup keeping the longest cluster member
    * ([[DedupOps.dedupCorpusBest]]) → benchmark decontamination (drop
    * train docs sharing a 5-gram with the stand-in eval slice, same
    * `doc_id % 29` split as [[DedupOps.docDecontam]]) → quality gate →
    * sequence packing over the SURVIVORS. Unlike [[corpusPrepared]]
    * (keep-min, sample output), this emits the packed-loader metadata of
    * [[SampleOps.docPack]] computed on the post-filter corpus — offsets
    * shift with every upstream drop, so a hash-green row proves the four
    * stages compose exactly, not just individually.
    *
    * Scale shape: both drop lists (near-dup members, contaminated docs)
    * are ≪ corpus and broadcast into anti-joins; the quality gate is a
    * scan-fused projection; the only exchange the corpus itself pays is
    * the per-lang pack window — hash-distributed, never SinglePartition.
    */
  def corpusPreparedBest(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kept = DedupOps.dedupCorpusBest(spark, sfDir)
      .filter(col("doc_id") % 29 =!= 0) // eval slice never ships in the corpus
      .select(col("doc_id"), col("lang"))
    val contaminated = DedupOps.docDecontam(spark, sfDir).select(col("doc_id"))
    val quality = TextOps.docQuality(spark, sfDir)
      .filter(col("n_tokens") >= 20 && col("uniq_ratio") >= 0.2)
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tok"))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    kept
      .join(broadcast(contaminated), Seq("doc_id"), "left_anti")
      .join(quality, Seq("doc_id"))
      .withColumn("cum_end", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("lang"), col("n_tok"),
        (col("cum_end") - col("n_tok")).as("start_off"),
        expr(s"(cum_end - n_tok) div ${SampleOps.Capacity}").as("first_chunk"),
        expr(s"(cum_end - 1) div ${SampleOps.Capacity} - " +
          s"(cum_end - n_tok) div ${SampleOps.Capacity} + 1").as("n_chunks"))
  }

  val corpusPreparedBestSql: String =
    s"""WITH RECURSIVE pairs AS (${DedupOps.minhashLshPairsSql}),
       |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs WHERE jacc >= 0.5
       |          UNION ALL SELECT b_id, a_id FROM pairs WHERE jacc >= 0.5),
       |reach(v, l) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, r.l FROM reach r JOIN edges e ON e.src = r.v),
       |labels AS (SELECT v AS doc_id, min(l) AS cluster_id FROM reach GROUP BY v),
       |ranked AS (
       |  SELECT labels.doc_id,
       |    row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY d.n_chars DESC, labels.doc_id) AS rk
       |  FROM labels JOIN documents d ON labels.doc_id = d.doc_id),
       |tok AS (SELECT doc_id,
       |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS toks
       |  FROM documents),
       |gh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks) - 4, 0) + 1),
       |    i -> ('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
       |          || toks[i+3] || ' ' || toks[i+4]), 1, 8))::BIGINT))) AS g
       |  FROM tok),
       |ev AS (SELECT DISTINCT g FROM gh WHERE doc_id % 29 = 0),
       |contam AS (SELECT DISTINCT doc_id FROM gh
       |           WHERE doc_id % 29 != 0 AND g IN (SELECT g FROM ev)),
       |q AS (SELECT doc_id, len(toks) AS n_tok,
       |        round(len(list_distinct(toks))::DOUBLE / len(toks), 4) AS uniq_ratio
       |      FROM tok),
       |kept AS (
       |  SELECT d.doc_id, d.lang, q.n_tok
       |  FROM documents d JOIN q USING (doc_id)
       |  WHERE d.doc_id % 29 != 0
       |    AND q.n_tok >= 20 AND q.uniq_ratio >= 0.2
       |    AND d.doc_id NOT IN (SELECT doc_id FROM ranked WHERE rk > 1)
       |    AND d.doc_id NOT IN (SELECT doc_id FROM contam))
       |SELECT doc_id, lang, n_tok,
       |  CAST(sum(n_tok) OVER w - n_tok AS BIGINT) AS start_off,
       |  CAST((sum(n_tok) OVER w - n_tok) // ${SampleOps.Capacity} AS BIGINT) AS first_chunk,
       |  CAST((sum(n_tok) OVER w - 1) // ${SampleOps.Capacity}
       |     - (sum(n_tok) OVER w - n_tok) // ${SampleOps.Capacity} + 1 AS BIGINT) AS n_chunks
       |FROM kept
       |WINDOW w AS (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING)""".stripMargin

  /** Per-source corpus report card — the monitoring panel a data-curation
    * team reads before admitting a crawl source: volume (docs, tokens),
    * shape (mean doc length), language spread, and exact-duplicate rate
    * (share of docs whose normalized text appears more than once
    * corpus-wide — the same digest as [[DedupOps.dedupExact]], so the
    * rate agrees with what the dedup stage will actually drop).
    *
    * Scale shape: two slim exchanges — a count-over-digest window (16-byte
    * digests + source labels, never the text) and the per-source fold.
    * Token/char totals are fold-order-free BIGINTs; the one mean is a
    * single IEEE division; the dup rate is integer basis points.
    */
  def corpusStats(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = graft.Tables.documents(spark, sfDir)
      .select(col("source"), col("lang"), col("n_chars"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n_tok"),
        md5(graft.functions.TextFns.normText(col("text"))).as("digest"))
    d.withColumn("is_dup",
        (count(lit(1)).over(Window.partitionBy(col("digest"))) > 1).cast("long"))
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("is_dup")).as("n_dup"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("CAST(sum_chars AS DOUBLE) / CAST(n_docs AS DOUBLE)").as("avg_chars"),
        col("n_langs"),
        expr("10000L * n_dup div n_docs").as("dup_bps"))
  }

  val corpusStatsSql: String =
    """WITH d AS (
      |  SELECT source, lang, n_chars,
      |    len(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS n_tok,
      |    md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS digest
      |  FROM documents),
      |f AS (
      |  SELECT *, CASE WHEN count(*) OVER (PARTITION BY digest) > 1
      |                 THEN 1 ELSE 0 END AS is_dup
      |  FROM d)
      |SELECT source,
      |  count(*) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |  CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_chars,
      |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |  (10000 * CAST(sum(is_dup) AS BIGINT)) // count(*) AS dup_bps
      |FROM f GROUP BY source""".stripMargin

  /** The COMPLETE corpus release pipeline as one oracle-gated query —
    * every best-practice stage a pretraining data release runs, composed
    * end to end: keep-best near-dup dedup → benchmark decontamination →
    * eval-slice exclusion → quality gate ([[corpusPreparedBest]]'s
    * survivor set) → LEAKAGE-SAFE train/val/test assignment
    * ([[SampleOps.docSplitSafe]] — near-dup clusters move whole, so a
    * surviving doc can never land in train while its near-duplicate
    * anchors an eval set) → whole-document FFD sequence packing per
    * (split, shard) ([[SampleOps.ffdPack]]). Emits the loader manifest:
    * (doc_id, split, shard, bin, n_tok).
    *
    * A hash-green row here proves SIX operators compose exactly — the
    * dedup clusters feed both the survivor set and the split keys (one
    * memoized CC run serves both), and any upstream drop re-shapes every
    * downstream bin. Scale shape inherits from the parts: broadcast drop
    * lists, scan-fused gates, cluster labels broadcast, and the packing
    * exchange carries (doc_id, n_tok, split, shard) only. Oracle: the
    * stages through the split are the EXISTING DuckDB oracle SQL
    * composed by the Python reference (tools/compare.py), which then
    * runs the same FFD; driver gate records rows-only.
    */
  def corpusRelease(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.TextFns.h32Sql
    val cap = SampleOps.Capacity
    val survivors = corpusPreparedBest(spark, sfDir)
      .select(col("doc_id"), col("n_tok"))
    val split = SampleOps.docSplitSafe(spark, sfDir)
      .select(col("doc_id"), col("split"))
    survivors.join(split, Seq("doc_id"))
      .select(col("doc_id"), col("n_tok"), col("split"),
        expr(s"${h32Sql("concat('rel|', cast(doc_id as string))")} % ${SampleOps.FfdShards}")
          .as("shard"))
      .as[(Long, Long, String, Long)]
      .groupByKey(t => (t._3, t._4))
      .flatMapGroups { (key: (String, Long), it: Iterator[(Long, Long, String, Long)]) =>
        SampleOps.ffdPack(it.map(t => (t._1, t._2)).toSeq, cap).iterator
          .map { case (id, bin, n) => (id, key._1, key._2, bin, n) }
      }
      .toDF("doc_id", "split", "shard", "bin", "n_tok")
  }

  /** The corpus-sized data passes of [[corpusRelease]] as a standalone
    * DuckDB-checkable query: the pre-pack manifest — survivor set
    * (keep-best dedup → decontam → eval-slice drop → quality gate) joined
    * to the leakage-safe split, plus the FFD shard key. Hash-green here
    * means the driver has verified every data pass of the release; only
    * the bounded per-(split, shard) FFD solve stays with the Python
    * oracle.
    */
  def corpusReleaseManifest(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFns.h32Sql
    corpusPreparedBest(spark, sfDir).select(col("doc_id"), col("n_tok"))
      .join(SampleOps.docSplitSafe(spark, sfDir)
        .select(col("doc_id"), col("split")), Seq("doc_id"))
      .select(col("doc_id"), col("n_tok"), col("split"),
        expr(s"${h32Sql("concat('rel|', cast(doc_id as string))")} % ${SampleOps.FfdShards}")
          .as("shard"))
  }

  // plain concatenation, no stripMargin: the embedded component SQL
  // contains '||'-leading continuation lines that stripMargin would
  // corrupt into single '|' operators
  val corpusReleaseManifestSql: String =
    "SELECT surv.doc_id, surv.n_tok, sp.split,\n" +
      "  ('0x' || substr(md5('rel|' || surv.doc_id), 1, 8))::BIGINT % " +
      s"${SampleOps.FfdShards} AS shard\n" +
      s"FROM (\n$corpusPreparedBestSql) surv\n" +
      s"JOIN (\n${SampleOps.docSplitSafeSql}) sp ON surv.doc_id = sp.doc_id"

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
