package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFns._

/** Text-analysis operators over the `documents` table — the language-ID /
  * quality-scoring / token-counting / fingerprinting layer a training-data
  * pipeline runs before dedup and filtering.
  *
  * All operators are narrow (per-row expressions, no shuffle except final
  * aggregations) and codegen-friendly: tokenization and scoring are
  * higher-order functions over a single `split`, so a 100 TB corpus scans
  * once with zero exchanges.
  */
object TextOps {

  private val stopEn = Seq("the", "a", "and", "of", "to", "in", "or", "is")
  private val stopEs = Seq("el", "la", "de", "los", "y", "en", "que", "un")
  private val stopFr = Seq("le", "la", "de", "les", "et", "en", "que", "un")
  private val stopDe = Seq("der", "die", "das", "und", "von", "zu", "ein", "mit")

  private def inList(xs: Seq[String]): String =
    xs.map(s => s"'$s'").mkString("(", ", ", ")")

  private def scoreSql(toks: String, xs: Seq[String]): String =
    s"size(filter($toks, x -> x IN ${inList(xs)}))"

  /** Token counting: total + distinct tokens per document. */
  def docTokens(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("t", tokens(col("text")))
      .select(col("doc_id"),
        size(col("t")).as("n_tokens"),
        size(array_distinct(col("t"))).as("n_uniq"))

  val docTokensSql: String =
    """SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_uniq
      |FROM (SELECT doc_id,
      |        string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
      |      FROM documents)""".stripMargin

  /** BPE-style pre-tokenizer count: maximal runs of letters / digits /
    * other-symbols, each with an optional leading space (the GPT-2
    * pre-tokenizer shape, minus unicode classes). Splits "foo, bar!" into
    * 4 tokens where whitespace counting sees 2 — the count that actually
    * predicts subword-tokenizer cost, plus bytes-per-token, the standard
    * corpus "tokenizability" signal. Pure scan-fused projection
    * (`regexp_count` is codegen'd); zero exchanges.
    */
  private val BpeTokenRe = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

  def docTokBpe(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("n_bpe", regexp_count(lower(col("text")), lit(BpeTokenRe)))
      .select(col("doc_id"),
        size(tokens(col("text"))).as("n_ws"),
        col("n_bpe"),
        expr("IF(n_bpe = 0, 0.0, round(length(text) / n_bpe, 4))")
          .as("bytes_per_tok"))

  val docTokBpeSql: String =
    """SELECT doc_id,
      |  len(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS n_ws,
      |  len(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')) AS n_bpe,
      |  CASE WHEN len(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')) = 0 THEN 0.0
      |       ELSE round(length(text) / len(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')), 4) END AS bytes_per_tok
      |FROM documents""".stripMargin

  /** Sliding-window chunking — split each document into fixed-size token
    * windows with overlap, the step that turns a variable-length corpus
    * into context-window-sized training units (overlap preserves
    * cross-boundary n-grams for next-token supervision). Chunk starts
    * are 1, 1+stride, …; a tail window whose tokens are all already
    * covered by the previous window (start+chunk−stride ≥ n, possible
    * because stride < chunk) is suppressed — it would be a pure
    * duplicate in the training stream.
    *
    * Scale shape: per-row `sequence`+`explode` — zero exchanges; output
    * fan-out per doc is n/stride rows, each carrying only its own slice
    * of the text, so downstream shuffles (e.g. a pack or shuffle stage)
    * move ~n/stride × chunk tokens, bounded by (chunk/stride)× the
    * corpus, never by doc count × max-doc-length.
    */
  def docChunk(spark: SparkSession, sfDir: String): DataFrame =
    docChunk(spark, sfDir, chunk = 64, stride = 48)

  def docChunk(spark: SparkSession, sfDir: String, chunk: Int, stride: Int): DataFrame =
    docChunkOf(Tables.documents(spark, sfDir), chunk, stride)

  /** Core over any (doc_id, text) frame — [[MergeOps.scd2]] pattern. */
  def docChunkOf(docs: DataFrame, chunk: Int, stride: Int): DataFrame =
    docs
      .withColumn("t", tokens(col("text")))
      .withColumn("n", size(col("t")))
      .withColumn("s", explode(expr(s"sequence(1, greatest(n, 1), $stride)")))
      .filter(col("s") === 1 || col("s") + (chunk - stride) <= col("n"))
      .select(col("doc_id"),
        expr(s"CAST((s - 1) div $stride AS BIGINT)").as("chunk_idx"),
        col("s").cast("long").as("tok_start"),
        least(lit(chunk), col("n") - col("s") + 1).cast("long").as("n_tok"),
        array_join(slice(col("t"), col("s"), lit(chunk)), " ").as("chunk_text"))

  val docChunkSql: String = {
    val (chunk, stride) = (64, 48)
    s"""SELECT doc_id,
       |  CAST((s - 1) // $stride AS BIGINT) AS chunk_idx,
       |  CAST(s AS BIGINT) AS tok_start,
       |  CAST(least($chunk, n - s + 1) AS BIGINT) AS n_tok,
       |  array_to_string(list_slice(t, s, s + ${chunk - 1}), ' ') AS chunk_text
       |FROM (
       |  SELECT doc_id, t, n, unnest(generate_series(1, greatest(n, 1), $stride)) AS s
       |  FROM (SELECT doc_id,
       |          string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t,
       |          len(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS n
       |        FROM documents))
       |WHERE s = 1 OR s + ${chunk - stride} <= n""".stripMargin
  }

  /** Quality scoring: length stats + stopword ratio (the filter signals a
    * pretraining pipeline thresholds on).
    */
  def docQuality(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("t", tokens(col("text")))
      .select(col("doc_id"),
        size(col("t")).as("n_tokens"),
        round(expr("aggregate(t, 0L, (a, x) -> a + length(x))").cast("double")
          / size(col("t")), 4).as("avg_token_len"),
        round(expr(scoreSql("t", stopEn)).cast("double") / size(col("t")), 4)
          .as("stop_ratio"),
        round(size(array_distinct(col("t"))).cast("double") / size(col("t")), 4)
          .as("uniq_ratio"))

  val docQualitySql: String =
    s"""SELECT doc_id, len(t) AS n_tokens,
       |  round(list_sum(list_transform(t, x -> length(x)))::DOUBLE / len(t), 4) AS avg_token_len,
       |  round(len(list_filter(t, x -> x IN ${inList(stopEn)}))::DOUBLE / len(t), 4) AS stop_ratio,
       |  round(len(list_distinct(t))::DOUBLE / len(t), 4) AS uniq_ratio
       |FROM (SELECT doc_id,
       |        string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
       |      FROM documents)""".stripMargin

  /** Language ID: stopword-profile scores with a deterministic argmax
    * (priority en > es > fr > de on ties; 'und' when nothing matches).
    * A real pipeline swaps richer n-gram profiles in; the operator shape
    * (per-row score vector → argmax) is the same.
    */
  def docLang(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("t", tokens(col("text")))
      .withColumn("s_en", expr(scoreSql("t", stopEn)))
      .withColumn("s_es", expr(scoreSql("t", stopEs)))
      .withColumn("s_fr", expr(scoreSql("t", stopFr)))
      .withColumn("s_de", expr(scoreSql("t", stopDe)))
      .select(col("doc_id"), col("s_en"), col("s_es"), col("s_fr"), col("s_de"),
        expr("""CASE
          WHEN s_en = 0 AND s_es = 0 AND s_fr = 0 AND s_de = 0 THEN 'und'
          WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
          WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
          WHEN s_fr >= s_de THEN 'fr'
          ELSE 'de' END""").as("lang_pred"))

  val docLangSql: String = {
    def sc(xs: Seq[String]) = s"len(list_filter(t, x -> x IN ${inList(xs)}))"
    s"""SELECT doc_id, s_en, s_es, s_fr, s_de,
       |  CASE
       |    WHEN s_en = 0 AND s_es = 0 AND s_fr = 0 AND s_de = 0 THEN 'und'
       |    WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
       |    WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
       |    WHEN s_fr >= s_de THEN 'fr'
       |    ELSE 'de' END AS lang_pred
       |FROM (
       |  SELECT doc_id, ${sc(stopEn)} AS s_en, ${sc(stopEs)} AS s_es,
       |         ${sc(stopFr)} AS s_fr, ${sc(stopDe)} AS s_de
       |  FROM (SELECT doc_id,
       |          string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
       |        FROM documents))""".stripMargin
  }

  /** Document fingerprinting: full md5 digest of the normalized text plus
    * the shared 32-bit hash (rolling-hash analogue; content-addressable id).
    */
  def docFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("norm", normText(col("text")))
      .select(col("doc_id"), md5(col("norm")).as("digest"),
        h32(col("norm")).as("fp32"))

  val docFingerprintSql: String =
    """SELECT doc_id, md5(norm) AS digest,
      |  ('0x' || substr(md5(norm), 1, 8))::BIGINT AS fp32
      |FROM (SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
      |      FROM documents)""".stripMargin

  /** Sensitive-term redaction — the PII-scrub shape (emails/phones/ids in
    * production; a vocabulary term list here so both mask branches are
    * exercised on the synthetic corpus). Per-row regex, zero exchanges; at
    * 100 TB this is a pure map stage fused into the scan. Output is the
    * match count plus a digest of the redacted text (full rewritten docs
    * stay in the executors — only 48 bytes/doc leave the scan).
    */
  def docRedact(spark: SparkSession, sfDir: String): DataFrame = {
    val pat = "\\b(customer|value|table)\\b"
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        // functions-API pattern args: a SQL-literal '\b' would be eaten by
        // SQL string escaping inside expr()
        size(regexp_extract_all(col("text"), lit(pat), lit(0))).as("n_masked"),
        md5(regexp_replace(col("text"), pat, "<MASK>")).as("redacted_md5"))
  }

  val docRedactSql: String =
    """SELECT doc_id,
      |  len(regexp_extract_all(text, '\b(customer|value|table)\b')) AS n_masked,
      |  md5(regexp_replace(text, '\b(customer|value|table)\b', '<MASK>', 'g')) AS redacted_md5
      |FROM documents""".stripMargin

  /** Corpus bigram frequency, top-100 — the vocabulary/statistics builder
    * (BPE seeding, stopword induction). Explode feeds a map-side partial
    * aggregate in the SAME stage, so the shuffle carries (gram, partial
    * count), not raw gram occurrences; the top-k is
    * TakeOrderedAndProject, never a global sort.
    */
  def docNgramFreq(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("t", tokens(col("text")))
      .select(explode(expr(grams2Sql("t"))).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram").asc)
      .limit(100)

  val docNgramFreqSql: String =
    """SELECT gram, count(*) AS n FROM (
      |  SELECT unnest(list_transform(range(1, len(t)),
      |    i -> t[i] || ' ' || t[i + 1])) AS gram
      |  FROM (SELECT string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
      |        FROM documents))
      |GROUP BY gram ORDER BY n DESC, gram ASC LIMIT 100""".stripMargin

  /** Top-100 2-grams via a Misra-Gries heavy-hitter summary — the
    * bounded-state twin of [[docNgramFreq]]. The exact form keeps
    * |vocabulary| live groups through its shuffle; this one carries at
    * most `capacity` counters per map task and merges C-sized summaries
    * on one reducer. With capacity ≥ |distinct grams| the summary is
    * exact (no decrement ever fires), so the query shares
    * [[docNgramFreqSql]] as a bit-exact oracle on testdata (931 distinct
    * 2-grams at sf0.1 vs capacity 4096); the small-capacity error bounds
    * are pinned in AccuracySpec.
    */
  def docNgramTopkSketch(spark: SparkSession, sfDir: String): DataFrame =
    docNgramTopkSketch(spark, sfDir, capacity = 4096)

  def docNgramTopkSketch(spark: SparkSession, sfDir: String, capacity: Int): DataFrame = {
    val mg = udaf(new graft.functions.MisraGries(capacity))
    Tables.documents(spark, sfDir)
      .withColumn("t", tokens(col("text")))
      .select(explode(expr(grams2Sql("t"))).as("gram"))
      .agg(mg(col("gram")).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e._1").as("gram"), col("e._2").as("n"))
      .orderBy(col("n").desc, col("gram").asc)
      .limit(100)
  }

  /** Document frequency, top-100 tokens — the df table behind idf
    * weighting and df-based stopword/boilerplate filters. `array_distinct`
    * BEFORE the explode keeps per-doc duplicates out of the shuffle
    * (explode feeds a map-side partial count, same discipline as
    * doc_ngram_freq).
    */
  def docDfTop(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("t", tokens(col("text")))
      .select(col("doc_id"), explode(array_distinct(col("t"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token").asc)
      .limit(100)

  val docDfTopSql: String =
    """SELECT token, count(*) AS df FROM (
      |  SELECT DISTINCT doc_id, unnest(list_distinct(t)) AS token
      |  FROM (SELECT doc_id,
      |          string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
      |        FROM documents))
      |GROUP BY token ORDER BY df DESC, token ASC LIMIT 100""".stripMargin

  /** Per-document top-3 tf-idf tokens — the keyword/topic extraction pass.
    * Ranking is by the INTEGER keys (tf desc, df asc, token asc), which
    * orders identically to the score for fixed N while staying immune to
    * cross-engine last-ulp differences in `ln`; the float score itself is
    * emitted rounded. Shuffle discipline: tf aggregates on (doc, token),
    * df reuses the tf table (one extra token-keyed agg + join), the final
    * rank windows on doc_id. Corpus size N is a 1-row aggregate broadcast
    * over a cross join — part of the same job, never a driver-blocking
    * `count()` that would scan the corpus once more per invocation.
    */
  def docTfidfTop(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = Tables.documents(spark, sfDir)
      .groupBy().agg(count(lit(1)).cast("double").as("n_docs"))
    // r14 note (attempted and REVERTED): flooring the tokenize+explode
    // scan with Tables.parallelized measured a consistent +30% at sf0.1
    // ({1.225, 1.232} → {1.599, 1.596} s, interleaved fresh-JVM A/B) —
    // the round-robin exchange lands between the scan and BOTH
    // consumers of the tf subtree, so the tokenize work stays serial
    // per-partition while the query pays an extra corpus-wide shuffle.
    // The r13 lesson holds: floors only pay when the fused chain is the
    // sole consumer of the scan (doc_span_clean shape), not when the
    // subtree is shared via exchange reuse.
    val tf = Tables.documents(spark, sfDir)
      .withColumn("t", tokens(col("text")))
      .select(col("doc_id"), explode(col("t")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("token").asc)
    tf.join(dfT, Seq("token"))
      .join(broadcast(n), lit(true))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("rn"), col("token"), col("tf"), col("df"),
        round(col("tf") * log(col("n_docs") / col("df")), 4).as("score"))
  }

  val docTfidfTopSql: String =
    """WITH tf AS (
      |  SELECT doc_id, token, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS token
      |    FROM documents)
      |  GROUP BY doc_id, token),
      |dft AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
      |n AS (SELECT count(*) AS n FROM documents)
      |SELECT doc_id, rn, token, tf, df, score FROM (
      |  SELECT tf.doc_id, tf.token, tf.tf, dft.df,
      |    round(tf.tf * ln(n.n::DOUBLE / dft.df), 4) AS score,
      |    row_number() OVER (PARTITION BY tf.doc_id
      |      ORDER BY tf.tf DESC, dft.df ASC, tf.token ASC) AS rn
      |  FROM tf JOIN dft USING (token), n)
      |WHERE rn <= 3""".stripMargin

  /** Compression-ratio quality signal (deflate bytes / raw bytes): highly
    * repetitive or templated text compresses far below prose — the cheap
    * single-pass repetition detector used alongside the n-gram rules. No
    * SQL builtin computes deflate, so this is a typed `mapPartitions`
    * (like the multimodal codec): one Deflater per partition, streaming,
    * zero exchanges, ~16 bytes/doc emitted. Deflate output is
    * deterministic for a fixed level and there is no DuckDB twin, but
    * CPython's `zlib.compress(raw, 1)` emits the byte-identical stream
    * (same zlib: level 1, wbits 15, memLevel 8 — verified 500/500 at
    * sf0.01), so `tools/compare.py` carries a python-side oracle
    * (`PY_ORACLES`) that hash-checks this query; the driver's SQL-only
    * gate still records it rows-only. The one twin subtlety is rounding:
    * `Math.round` is half-up, Python `round()` is banker's — the oracle
    * mirrors Java with floor(x·10⁴+0.5).
    */
  def compressionRatio(docs: org.apache.spark.sql.Dataset[(Long, String)]): DataFrame = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
      val buf = new Array[Byte](1 << 16)
      it.map { case (id, text) =>
        val raw = text.getBytes("UTF-8")
        deflater.reset()
        deflater.setInput(raw)
        deflater.finish()
        var n = 0L
        while (!deflater.finished()) n += deflater.deflate(buf)
        (id, raw.length.toLong, math.round(n.toDouble / math.max(raw.length, 1) * 10000) / 10000.0)
      }
    }.toDF("doc_id", "n_bytes", "deflate_ratio")
  }

  /** Driver-checkable companion of [[compressionRatio]] (r9, shrinking
    * the SQL-gate blind spot): deflate itself has no DuckDB twin, but the
    * data pass feeding it does — per doc the exact UTF-8 byte length the
    * ratio divides by and the md5 of the exact payload handed to the
    * Deflater. A hash-green row here pins everything about doc_compress
    * except the codec call, which the Python zlib oracle covers.
    */
  def docCompressProbe(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        call_function("octet_length", col("text")).cast("long").as("n_bytes"),
        md5(col("text").cast("binary")).as("payload_md5"))

  val docCompressProbeSql: String =
    """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
      |  md5(text) AS payload_md5
      |FROM documents""".stripMargin

  /** Within-document repetition (the Gopher/CCNet duplicate-n-gram quality
    * rule): share of the doc's 2-grams occupied by its single most
    * frequent 2-gram. Two hash aggregations — (doc, gram) then (doc) —
    * both with map-side partials; no joins, no windows.
    */
  def docRep2gram(spark: SparkSession, sfDir: String): DataFrame =
    // r13: tokenization + 2-gram explode fuse into the docs scan — floor
    // the parallelism (Tables.parallelized; measured −0.14 s at sf0.1)
    Tables.parallelized(Tables.documents(spark, sfDir))
      .withColumn("t", tokens(col("text")))
      .select(col("doc_id"), explode(expr(grams2Sql("t"))).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_2grams"), max(col("n")).as("max_rep"),
        round(max(col("n")).cast("double") / sum(col("n")), 4).as("rep_ratio"))

  /** Composite Gopher-style quality admission (Rae et al. 2021 §A.1.1,
    * adapted to this corpus's newline-less docs): five per-document rules
    * — token-count bounds, mean-word-length band, minimum stopword
    * evidence, distinct-token ratio, and the duplicate-2-gram share from
    * [[docRep2gram]] — each emitted as a 0/1 flag plus the conjunction
    * (`admit`). Pipelines threshold on `admit` but keep the per-rule flags
    * for ablation/debugging, so both are first-class output columns.
    *
    * Thresholds are set so every rule fires both ways on the synthetic
    * corpus (token count spans 10–100, rule 25–90; avg word length
    * 3.5–5.7, rule ≥ 3.8; stopwords 0–14, rule ≥ 1; uniq ratio 0.27–1.0,
    * rule ≥ 0.30; rep ratio 0.01–0.22, rule ≤ 0.10).
    *
    * Scale shape: four rules are scan-fused per-row expressions; the rep
    * rule reuses [[docRep2gram]]'s two map-side-combined aggregations, and
    * the final join is doc_id-keyed carrying ~40 bytes/doc. Flags compare
    * round(·,4) values against exact decimal literals, so the oracle
    * comparison is drift-free.
    */
  def docGopherFilter(spark: SparkSession, sfDir: String): DataFrame = {
    // r13: the whole feature panel fuses into the docs scan — floor the
    // parallelism (Tables.parallelized; measured −0.14 s at sf0.1, with
    // downstream doc_quality_train flat within its iteration-latency noise)
    val base = Tables.parallelized(Tables.documents(spark, sfDir))
      .withColumn("t", tokens(col("text")))
      .select(col("doc_id"),
        size(col("t")).as("n_tokens"),
        // zero-token guard: both engines tokenize empty text to [''] (size 1),
        // but the operator must be total — a genuinely empty token array
        // (null text under permissive ingest) scores 0, not null, so the
        // downstream rule conjunction stays 0/1-valued
        when(size(col("t")) === 0, lit(0.0))
          .otherwise(round(expr("aggregate(t, 0L, (a, x) -> a + length(x))").cast("double")
            / size(col("t")), 4)).as("avg_token_len"),
        expr(scoreSql("t", stopEn)).as("n_stop"),
        when(size(col("t")) === 0, lit(0.0))
          .otherwise(round(size(array_distinct(col("t"))).cast("double") / size(col("t")), 4))
          .as("uniq_ratio"))
    val rep = docRep2gram(spark, sfDir).select(col("doc_id"), col("rep_ratio"))
    base.join(rep, Seq("doc_id"), "left")
      .withColumn("rep_ratio", coalesce(col("rep_ratio"), lit(0.0)))
      .withColumn("r_len", col("n_tokens").between(25, 90).cast("int"))
      .withColumn("r_wordlen",
        (col("avg_token_len") >= 3.8 && col("avg_token_len") <= 10.0).cast("int"))
      .withColumn("r_stop", (col("n_stop") >= 1).cast("int"))
      .withColumn("r_uniq", (col("uniq_ratio") >= 0.30).cast("int"))
      .withColumn("r_rep", (col("rep_ratio") <= 0.10).cast("int"))
      .withColumn("admit",
        (col("r_len") * col("r_wordlen") * col("r_stop") * col("r_uniq") * col("r_rep"))
          .cast("int"))
  }

  val docGopherFilterSql: String =
    s"""WITH t AS (SELECT doc_id,
       |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
       |  FROM documents),
       |base AS (
       |  SELECT doc_id, len(t) AS n_tokens,
       |    CASE WHEN len(t) = 0 THEN 0.0 ELSE
       |      round(list_sum(list_transform(t, x -> length(x)))::DOUBLE / len(t), 4) END AS avg_token_len,
       |    len(list_filter(t, x -> x IN ${inList(stopEn)})) AS n_stop,
       |    CASE WHEN len(t) = 0 THEN 0.0 ELSE
       |      round(len(list_distinct(t))::DOUBLE / len(t), 4) END AS uniq_ratio
       |  FROM t),
       |rep AS (
       |  SELECT doc_id, round(max(n)::DOUBLE / sum(n), 4) AS rep_ratio FROM (
       |    SELECT doc_id, gram, count(*) AS n FROM (
       |      SELECT doc_id, unnest(list_transform(range(1, len(t)),
       |        i -> t[i] || ' ' || t[i + 1])) AS gram FROM t)
       |    GROUP BY doc_id, gram)
       |  GROUP BY doc_id)
       |SELECT doc_id, n_tokens, avg_token_len, n_stop, uniq_ratio, rep_ratio,
       |  r_len, r_wordlen, r_stop, r_uniq, r_rep,
       |  (r_len * r_wordlen * r_stop * r_uniq * r_rep)::INTEGER AS admit
       |FROM (
       |  SELECT base.doc_id, n_tokens, avg_token_len, n_stop, uniq_ratio,
       |    coalesce(rep_ratio, 0.0) AS rep_ratio,
       |    (n_tokens BETWEEN 25 AND 90)::INTEGER AS r_len,
       |    (avg_token_len >= 3.8 AND avg_token_len <= 10.0)::INTEGER AS r_wordlen,
       |    (n_stop >= 1)::INTEGER AS r_stop,
       |    (uniq_ratio >= 0.30)::INTEGER AS r_uniq,
       |    (coalesce(rep_ratio, 0.0) <= 0.10)::INTEGER AS r_rep
       |  FROM base LEFT JOIN rep ON base.doc_id = rep.doc_id)""".stripMargin

  val docRep2gramSql: String =
    """SELECT doc_id, sum(n)::BIGINT AS n_2grams, max(n) AS max_rep,
      |  round(max(n)::DOUBLE / sum(n), 4) AS rep_ratio
      |FROM (
      |  SELECT doc_id, gram, count(*) AS n FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(t)),
      |      i -> t[i] || ' ' || t[i + 1])) AS gram
      |    FROM (SELECT doc_id,
      |            string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
      |          FROM documents))
      |  GROUP BY doc_id, gram)
      |GROUP BY doc_id""".stripMargin

  /** Count-Min sketch frequency estimation over the corpus 2-gram stream
    * — the classic bounded-state streaming-frequency sketch (Cormode &
    * Muthukrishnan 2005), complementing Misra-Gries (top-k identity) and
    * HLL (cardinality): CMS answers point frequency queries with
    * one-sided error (est ≥ true, overshoot ≤ εN w.h.p.) in d·w longs of
    * state regardless of vocabulary size. d=4 rows use the same
    * pairwise-independent family as MinHash ((Aᵢ·h + Bᵢ) mod P, then mod
    * w=512 buckets); output compares the sketch estimate against the
    * exact count for the top-100 grams, so the overshoot is visible in
    * the result (est = n wherever no collision landed).
    *
    * Scale shape: the sketch build explodes each gram occurrence into d
    * (row, bucket) pairs whose map-side partial count collapses every
    * partition's contribution to ≤ d·w rows — the shuffle carries KBs at
    * any corpus size, the defining CMS property. The probe side joins
    * 100·d slim rows against the d·w-row sketch. All arithmetic is
    * integer → bit-exact DuckDB oracle.
    */
  def docCmsFreq(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFns.{MinhashA, MinhashB, MinhashP}
    val d = 4
    val w = 512
    val aArr = MinhashA.take(d).mkString("array(", "L, ", "L)")
    val bArr = MinhashB.take(d).mkString("array(", "L, ", "L)")
    val bucketRows =
      s"""transform(sequence(0, ${d - 1}), i -> named_struct(
         |  'i', i,
         |  'b', ((element_at($aArr, i + 1) * h + element_at($bArr, i + 1))
         |        % ${MinhashP}L) % $w))""".stripMargin
    val grams = Tables.parallelized(Tables.documents(spark, sfDir)) // r13: parallel gram build
      .withColumn("t", tokens(col("text")))
      .select(explode(expr(grams2Sql("t"))).as("gram"))
      .withColumn("h", expr(h32Sql("gram")))
      .transform(graft.CacheScope.barrier) // sketch build + exact top-100 share the stream
    val cms = grams
      .select(explode(expr(bucketRows)).as("r"))
      .select(col("r.i").as("i"), col("r.b").as("b")) // named keys -> named exchange (PlanSpec greps i#/b#)
      .groupBy(col("i"), col("b"))
      .agg(count(lit(1)).as("c"))
    val top = grams
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram").asc)
      .limit(100)
    top
      .withColumn("h", expr(h32Sql("gram")))
      .select(col("gram"), col("n"), explode(expr(bucketRows)).as("r"))
      .select(col("gram"), col("n"), col("r.i").as("i"), col("r.b").as("b"))
      .join(cms, Seq("i", "b"))
      .groupBy(col("gram"), col("n"))
      .agg(min(col("c")).as("est"))
  }

  val docCmsFreqSql: String = {
    import graft.functions.TextFns.{MinhashA, MinhashB, MinhashP}
    val d = 4
    val w = 512
    val aArr = MinhashA.take(d).mkString("[", ", ", "]")
    val bArr = MinhashB.take(d).mkString("[", ", ", "]")
    val bkt = s"(($aArr[i + 1] * h + $bArr[i + 1]) % $MinhashP) % $w"
    s"""WITH g AS (
       |  SELECT unnest(list_transform(range(1, len(t)),
       |    i -> t[i] || ' ' || t[i + 1])) AS gram
       |  FROM (SELECT string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
       |        FROM documents)),
       |gh AS (SELECT gram, ('0x' || substr(md5(gram), 1, 8))::BIGINT AS h FROM g),
       |cms AS (
       |  SELECT i, $bkt AS b, count(*) AS c
       |  FROM gh CROSS JOIN (SELECT unnest(range(0, $d)) AS i)
       |  GROUP BY 1, 2),
       |top AS (SELECT gram, count(*) AS n FROM g
       |        GROUP BY gram ORDER BY n DESC, gram ASC LIMIT 100),
       |probe AS (
       |  SELECT gram, n, i, $bkt AS b
       |  FROM (SELECT gram, n, ('0x' || substr(md5(gram), 1, 8))::BIGINT AS h FROM top)
       |       CROSS JOIN (SELECT unnest(range(0, $d)) AS i))
       |SELECT gram, n, min(c) AS est
       |FROM probe JOIN cms USING (i, b)
       |GROUP BY gram, n""".stripMargin
  }

  /** Fixed-weight logistic quality classifier — the model-based filter
    * shape (DCLM / CCNet's fastText gate: a linear model over cheap
    * per-doc features, thresholded). Weights are frozen constants here
    * (a real deployment loads trained ones; the operator shape —
    * scan-fused feature vector → dot product → threshold — is what
    * matters). The sigmoid is never evaluated: admit thresholds the
    * LOGIT at 0 (= P > ½), so no transcendental enters the
    * cross-engine comparison; inputs are the round(·,4) features of
    * [[docQuality]], the product-sum chain is written identically in
    * both engines, and the logit is re-rounded to 4 decimals.
    *
    * Scale shape: inherits [[docQuality]]'s zero-exchange scan fusion;
    * the classifier adds four multiplies per row.
    */
  def docQualityLogit(spark: SparkSession, sfDir: String): DataFrame =
    docQuality(spark, sfDir)
      // features re-quantized to integer 1e-4 grid (they were produced by
      // round(.,4), so this is exact), then the whole dot product in scaled
      // integers: logit*2e5 = -6e5 + 50*u4 + 120*s4 + 7*a4 — one float op
      // (the final division) survives to the comparison
      .withColumn("lq", expr(
        """-600000L + 50L * CAST(round(uniq_ratio * 10000) AS BIGINT)
          |         + 120L * CAST(round(stop_ratio * 10000) AS BIGINT)
          |         + 7L * CAST(round(avg_token_len * 10000) AS BIGINT)""".stripMargin))
      .select(col("doc_id"),
        // logit = lq/2e5 on the 1e-4 grid = lq/20 half-up — the tie (lq%20
        // == ±10) is broken in integer space; round(lq/200000.0, 4) parked
        // it on engine-dependent double formatting (diverged at sf0.1)
        (floor((col("lq") + 10L) / lit(20.0)) / lit(10000.0)).as("logit"),
        (col("lq") >= 0L).cast("int").as("admit"))

  val docQualityLogitSql: String =
    s"""SELECT doc_id, floor((lq + 10) / 20.0) / 10000.0 AS logit,
       |  (lq >= 0)::INTEGER AS admit FROM (
       |  SELECT doc_id,
       |    -600000 + 50 * CAST(round(uniq_ratio * 10000) AS BIGINT)
       |            + 120 * CAST(round(stop_ratio * 10000) AS BIGINT)
       |            + 7 * CAST(round(avg_token_len * 10000) AS BIGINT) AS lq
       |  FROM ($docQualitySql) q0)""".stripMargin

  /** Character-level Shannon entropy of the normalized text — the
    * classic gibberish/repetition signal (random token-salad maximizes
    * it, single-char spam minimizes it; natural language sits in a
    * narrow band, so pipelines threshold both tails). Computed as
    * H = ln(n) − (Σ cᵢ·ln cᵢ)/n over the character histogram — the
    * factored form keeps the per-character terms integer-quantizable:
    * each cᵢ·ln(cᵢ) is rounded to micro-nats (BIGINT) before the sum,
    * the [[docLmScore]] determinism recipe, so the fold order can never
    * flip a hash.
    *
    * Scale shape: pure per-row HOF over ≤37 distinct characters — no
    * shuffle at all; the scan reads (doc_id, text) only.
    */
  def docEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.CharEntropyQ.register(spark)
    Tables.documents(spark, sfDir)
      .withColumn("norm", normText(col("text")))
      .withColumn("n", length(col("norm")))
      .withColumn("s", expr("char_entropy_q(norm)")) // native one-pass histogram kernel
      .select(col("doc_id"), col("n").cast("long").as("n_chars_norm"),
        when(col("n") === 0, lit(0.0))
          .otherwise(round(log(col("n")) - col("s") / lit(1000000.0) / col("n"), 4))
          .as("entropy"))
  }

  val docEntropySql: String =
    """WITH t AS (SELECT doc_id,
      |    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
      |  FROM documents),
      |c AS (SELECT doc_id, length(norm) AS n,
      |    list_transform(range(1, length(norm) + 1), i -> substr(norm, i, 1)) AS chars
      |  FROM t),
      |e AS (SELECT doc_id, n,
      |    list_sum(list_transform(list_sort(list_distinct(chars)),
      |      ch -> CAST(round(len(list_filter(chars, x -> x = ch))
      |        * ln(len(list_filter(chars, x -> x = ch))) * 1000000.0) AS BIGINT))) AS s
      |  FROM c)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_chars_norm,
      |  CASE WHEN n = 0 THEN 0.0
      |       ELSE round(ln(n) - s / 1000000.0 / n, 4) END AS entropy
      |FROM e""".stripMargin

  /** Per-source document cap — the domain-balancing admission step (a
    * crawl is dominated by a few giant hosts; pipelines cap each
    * source's contribution, keeping its best N docs). Quality proxy =
    * n_chars (swap any score; one orderBy). Emits the kept docs with
    * their within-source rank.
    *
    * Scale shape: top-N per group without a per-source global sort —
    * phase 1 ranks inside (source, doc_id%16) salt cells and keeps N
    * per cell (the map-side combine of top-N: the global per-source
    * top-N is necessarily a subset of the union of cell top-Ns), so
    * the final per-source window sees ≤ 16·N rows per source instead
    * of a giant host's entire crawl — the standard fix for the
    * single-hot-partition window at 100 TB.
    */
  def docSourceCap(spark: SparkSession, sfDir: String, capN: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val local = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("salt", (col("doc_id") % 16).cast("int"))
      .withColumn("lrk", row_number().over(
        Window.partitionBy(col("source"), col("salt"))
          .orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("lrk") <= capN)
    local
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("rk") <= capN)
      .select(col("doc_id"), col("source"), col("n_chars"), col("rk"))
  }

  val docSourceCapSql: String =
    """SELECT doc_id, source, n_chars,
      |  CAST(row_number() OVER (PARTITION BY source
      |    ORDER BY n_chars DESC, doc_id) AS INTEGER) AS rk
      |FROM documents
      |QUALIFY rk <= 5""".stripMargin

  /** Smoothed-bigram language-model score per document — the
    * perplexity-proxy quality filter (CCNet trains a KenLM on a clean
    * corpus and drops high-perplexity docs; here the model is trained on
    * the corpus itself, which is the same operator shape: train counts,
    * broadcast nothing, score by join). Score = mean over the doc's
    * bigram OCCURRENCES of ln P(w2|w1) under add-½ smoothing,
    * P(w2|w1) = (C(w1 w2) + ½) / (C(w1 ·) + ½·V); higher = more typical
    * of the corpus, templated/duplicated text scores high, token-salad
    * scores low.
    *
    * Float determinism: a per-doc sum of doubles is fold-ORDER-sensitive
    * and Spark's partial aggregation order is not the oracle's, so each
    * bigram's log-prob is quantized to integer micro-nats
    * (round(lp·10⁶) as BIGINT) BEFORE summation — integer sums are
    * order-free and exact — and the only float ops after the quantize are
    * one division chain + round(·,4), identical in both engines. (The
    * ln itself follows the [[docTfidfTop]] precedent: JVM `Math.log` and
    * DuckDB `ln` agree to far beyond the quantization grid.)
    *
    * Scale shape: the model tables shuffle slim (gram, count) /
    * (head, count) rows with map-side partials; scoring is two equijoins
    * on those keys plus a 1-row broadcast for V; the per-doc reduce is an
    * integer sum with map-side combine. Nothing is collected, nothing is
    * all-pairs; the corpus text is scanned once for bigrams and once for
    * the vocabulary count.
    */
  def docLmScore(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokens(col("text")).as("t"))
    val bi = docs
      .select(col("doc_id"), explode(expr(grams2Sql("t"))).as("g"))
      .transform(graft.CacheScope.barrier) // model build + scoring share one pass
    val c2 = bi.groupBy(col("g")).agg(count(lit(1)).as("c2"))
    val c1 = bi.groupBy(substring_index(col("g"), " ", 1).as("w1"))
      .agg(count(lit(1)).as("c1"))
    val vocab = docs.select(explode(col("t")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val scored = bi
      .join(c2, Seq("g"))
      .withColumn("w1", substring_index(col("g"), " ", 1))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab)) // 1-row scalar attach
      .withColumn("lpq",
        round(log((col("c2") + lit(0.5)) / (col("c1") + lit(0.5) * col("v"))) * lit(1000000.0))
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lpq")).as("slp"))
      // same exact-integer display rounding as docDsir: round(slp/(nb·1e6), 4)
      // == half-away(slp/(nb·100)) / 1e4, computed tie-free in integers
      .withColumn("q", expr(
        """IF(slp >= 0, (slp + n_bigrams * 50) div (n_bigrams * 100),
          |   -((-slp + n_bigrams * 50) div (n_bigrams * 100)))""".stripMargin))
      .withColumn("lm_score", col("q").cast("double") / lit(10000.0))
      .select(col("doc_id"), col("n_bigrams"), col("lm_score"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_score"), lit(0.0)).as("lm_score"))
  }

  /** Held-out variant of [[docLmScore]] — the actual CCNet recipe: the
    * bigram model trains on the clean slice (`doc_id % 5 != 0`, the same
    * stand-in-split convention as `dedup_incremental` / `doc_decontam`)
    * and scores the OTHER slice, so the score measures typicality under a
    * reference corpus rather than self-perplexity. Unseen grams now
    * exist: a scored bigram absent from the model takes C=0 on the
    * missing side(s) via left joins, which add-½ smoothing turns into
    * P = ½/(C(w1·)+½V) (and 1/V for an unseen head) — exactly the
    * closed-form backoff the smoothing is for.
    *
    * Same scale shape and integer micro-nat quantization as
    * [[docLmScore]]; the model tables are built from ~4/5 of the corpus
    * and the scored stream is the remaining 1/5, joined on slim keys.
    */
  def docLmScoreHeldout(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokens(col("text")).as("t"))
    val bi = docs
      .select(col("doc_id"), explode(expr(grams2Sql("t"))).as("g"))
      .transform(graft.CacheScope.barrier) // train counts + heldout stream share one pass
    val train = bi.filter(col("doc_id") % 5 =!= 0)
    val c2 = train.groupBy(col("g")).agg(count(lit(1)).as("c2"))
    val c1 = train.groupBy(substring_index(col("g"), " ", 1).as("w1"))
      .agg(count(lit(1)).as("c1"))
    val vocab = docs.filter(col("doc_id") % 5 =!= 0)
      .select(explode(col("t")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val scored = bi.filter(col("doc_id") % 5 === 0)
      .join(c2, Seq("g"), "left")
      .withColumn("w1", substring_index(col("g"), " ", 1))
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab)) // 1-row scalar attach
      .withColumn("lpq",
        round(log((coalesce(col("c2"), lit(0L)) + lit(0.5))
          / (coalesce(col("c1"), lit(0L)) + lit(0.5) * col("v"))) * lit(1000000.0))
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lpq")).as("slp"))
      // tie-free integer display rounding (see docLmScore)
      .withColumn("q", expr(
        """IF(slp >= 0, (slp + n_bigrams * 50) div (n_bigrams * 100),
          |   -((-slp + n_bigrams * 50) div (n_bigrams * 100)))""".stripMargin))
      .withColumn("lm_score", col("q").cast("double") / lit(10000.0))
      .select(col("doc_id"), col("n_bigrams"), col("lm_score"))
    docs.filter(col("doc_id") % 5 === 0).select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_score"), lit(0.0)).as("lm_score"))
  }

  val docLmScoreHeldoutSql: String =
    """WITH tok AS (SELECT doc_id,
      |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
      |  FROM documents),
      |bi AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
      |    i -> t[i] || ' ' || t[i + 1])) AS g FROM tok),
      |c2 AS (SELECT g, count(*) AS c2 FROM bi WHERE doc_id % 5 != 0 GROUP BY g),
      |c1 AS (SELECT split_part(g, ' ', 1) AS w1, count(*) AS c1
      |       FROM bi WHERE doc_id % 5 != 0 GROUP BY 1),
      |v AS (SELECT count(DISTINCT w) AS v
      |      FROM (SELECT unnest(t) AS w FROM tok WHERE doc_id % 5 != 0)),
      |sc AS (SELECT doc_id,
      |    CAST(round(ln((coalesce(c2.c2, 0) + 0.5)
      |      / (coalesce(c1.c1, 0) + 0.5 * v.v)) * 1000000.0) AS BIGINT) AS lpq
      |  FROM bi LEFT JOIN c2 USING (g)
      |          LEFT JOIN c1 ON split_part(bi.g, ' ', 1) = c1.w1
      |          CROSS JOIN v
      |  WHERE bi.doc_id % 5 = 0),
      |agg AS (SELECT doc_id, count(*) AS n_bigrams, sum(lpq) AS slp
      |        FROM sc GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(agg.n_bigrams, 0) AS n_bigrams,
      |  coalesce((CASE WHEN agg.slp >= 0
      |                 THEN (agg.slp + agg.n_bigrams * 50) // (agg.n_bigrams * 100)
      |                 ELSE -((-agg.slp + agg.n_bigrams * 50) // (agg.n_bigrams * 100))
      |            END) / 10000.0, 0.0) AS lm_score
      |FROM documents d LEFT JOIN agg USING (doc_id)
      |WHERE d.doc_id % 5 = 0""".stripMargin

  private val lmCtes: String =
    """WITH tok AS (SELECT doc_id,
      |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
      |  FROM documents),
      |bi AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
      |    i -> t[i] || ' ' || t[i + 1])) AS g FROM tok),
      |c2 AS (SELECT g, count(*) AS c2 FROM bi GROUP BY g),
      |c1 AS (SELECT split_part(g, ' ', 1) AS w1, count(*) AS c1 FROM bi GROUP BY 1),
      |v AS (SELECT count(DISTINCT w) AS v
      |      FROM (SELECT unnest(t) AS w FROM tok)),
      |sc AS (SELECT doc_id,
      |    CAST(round(ln((c2.c2 + 0.5) / (c1.c1 + 0.5 * v.v)) * 1000000.0) AS BIGINT) AS lpq
      |  FROM bi JOIN c2 USING (g)
      |          JOIN c1 ON split_part(bi.g, ' ', 1) = c1.w1
      |          CROSS JOIN v),
      |agg AS (SELECT doc_id, count(*) AS n_bigrams, sum(lpq) AS slp
      |        FROM sc GROUP BY doc_id),
      |lm AS (SELECT d.doc_id, coalesce(agg.n_bigrams, 0) AS n_bigrams,
      |  coalesce((CASE WHEN agg.slp >= 0
      |                 THEN (agg.slp + agg.n_bigrams * 50) // (agg.n_bigrams * 100)
      |                 ELSE -((-agg.slp + agg.n_bigrams * 50) // (agg.n_bigrams * 100))
      |            END) / 10000.0, 0.0) AS lm_score
      |FROM documents d LEFT JOIN agg USING (doc_id))""".stripMargin

  val docLmScoreSql: String =
    lmCtes + "\nSELECT doc_id, n_bigrams, lm_score FROM lm"

  /** CCNet-style head/middle/tail bucketing: per language, split the
    * corpus into perplexity terciles of the [[docLmScore]] signal (CCNet
    * buckets each language shard by KenLM perplexity and trains mostly on
    * the head). `head` = the ~third of docs MOST typical of the corpus
    * (highest lm_score), ties share a bucket.
    *
    * Scale shape — deliberately NOT `ntile() OVER (PARTITION BY lang)`:
    * a per-lang doc-level window is one task per language at 100 TB. The
    * scores land on a 1e-4 grid (lm_score is rounded), so bucketing runs
    * on the HISTOGRAM instead: a slim (lang, score, cnt) aggregate with
    * map-side combine, a window over the per-lang DISTINCT scores (≤ a
    * few 100k rows per lang, not billions), integer cutoff arithmetic
    * (3·cum_gt < n, no float thresholds to flip), and a broadcast join
    * of the (lang, score → bucket) map back onto the scored stream.
    */
  def docCcnetBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = docLmScore(spark, sfDir)
      .join(Tables.documents(spark, sfDir).select(col("doc_id"), col("lang")),
        Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("lm_score"))
    val hist = scored.groupBy(col("lang"), col("lm_score"))
      .agg(count(lit(1)).as("cnt"))
    val nl = scored.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val buckets = hist
      .withColumn("cum_gt", coalesce(sum(col("cnt")).over(
        Window.partitionBy(col("lang")).orderBy(col("lm_score").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(nl, Seq("lang"))
      .withColumn("bucket",
        when(col("cum_gt") * 3 < col("n"), lit("head"))
          .when(col("cum_gt") * 3 < col("n") * 2, lit("middle"))
          .otherwise(lit("tail")))
      .select(col("lang"), col("lm_score"), col("bucket"))
    scored.join(broadcast(buckets), Seq("lang", "lm_score"))
      .select(col("doc_id"), col("lang"), col("lm_score"), col("bucket"))
  }

  val docCcnetBucketsSql: String =
    lmCtes +
      """,
        |scl AS (SELECT lm.doc_id, d.lang, lm.lm_score
        |        FROM lm JOIN documents d USING (doc_id)),
        |hist AS (SELECT lang, lm_score, count(*) AS cnt FROM scl GROUP BY 1, 2),
        |nl AS (SELECT lang, count(*) AS n FROM scl GROUP BY 1),
        |cum AS (SELECT lang, lm_score,
        |    coalesce(sum(cnt) OVER (PARTITION BY lang ORDER BY lm_score DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_gt
        |  FROM hist),
        |bk AS (SELECT cum.lang, cum.lm_score,
        |    CASE WHEN cum_gt * 3 < nl.n THEN 'head'
        |         WHEN cum_gt * 3 < nl.n * 2 THEN 'middle'
        |         ELSE 'tail' END AS bucket
        |  FROM cum JOIN nl USING (lang))
        |SELECT scl.doc_id, scl.lang, scl.lm_score, bk.bucket
        |FROM scl JOIN bk USING (lang, lm_score)""".stripMargin

  /** DSIR-style importance weight for data selection (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * log w(x) = log p_target(x) − log p_source(x) under hashed
    * bag-of-unigram models — the weight used to resample a raw corpus
    * toward a trusted target distribution. Target model = the `src0`
    * slice (the stand-in trusted source, same convention as
    * [[docLmScoreHeldout]]'s `% 5` split); source model = the whole
    * corpus. Features are unigrams hashed into `buckets` counts with
    * add-1 smoothing; per-token log-ratios are quantized to integer
    * micro-nats BEFORE the per-doc sum (the [[docLmScore]] determinism
    * recipe — integer sums are fold-order-free).
    *
    * Scale shape: one tokenize pass feeds both model builds and the
    * scoring stream (barrier'd); the two model tables are ≤ `buckets`
    * rows NO MATTER the corpus size, so both ride a broadcast join —
    * the 100 TB token stream never shuffles on the feature key. The
    * only wide exchange is the per-doc integer sum, with map-side
    * combine.
    */
  def docDsir(spark: SparkSession, sfDir: String, buckets: Int = 10000): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("t"))
    val tw = docs.select(col("doc_id"), col("source"), explode(col("t")).as("w"))
      .withColumn("b", pmod(expr(h32Sql("w")), lit(buckets.toLong)))
      .select(col("doc_id"), col("source"), col("b"))
      .transform(graft.CacheScope.barrier) // model builds + scoring share one tokenize pass
    val tgt = tw.filter(col("source") === "src0")
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val srcAll = tw.groupBy(col("b")).agg(count(lit(1)).as("cs"))
    val nt = tgt.agg(sum(col("ct")).as("nt"))
    val ns = srcAll.agg(sum(col("cs")).as("ns"))
    val agg = tw
      .join(broadcast(tgt), Seq("b"), "left")
      .join(broadcast(srcAll), Seq("b"))
      .crossJoin(broadcast(nt)).crossJoin(broadcast(ns)) // 1-row scalar attaches
      .withColumn("lrq",
        round((log((coalesce(col("ct"), lit(0L)) + lit(1.0)) / (col("nt") + lit(buckets)))
          - log((col("cs") + lit(1.0)) / (col("ns") + lit(buckets)))) * lit(1000000.0))
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lrq")).as("s"))
      // display rounding in EXACT integer space: round(s/1e6, 4) on a
      // double ties whenever s % 100 == 50, and each engine then rounds
      // its own nearest-double of the tie — caught diverging at the
      // sf0.1 gate (one doc, ±0.0001). Half-away-from-zero on the
      // integer micro-nats is engine-independent; the final /1e4 maps
      // the same integer to the same double on both sides.
      .withColumn("sr",
        expr("IF(s >= 0, (s + 50) div 100, -((-s + 50) div 100))"))
      .withColumn("dsir_logw", col("sr").cast("double") / lit(10000.0))
      .select(col("doc_id"), col("n_tokens"), col("dsir_logw"))
    docs.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("dsir_logw"), lit(0.0)).as("dsir_logw"))
  }

  private val dsirCtes: String =
    """WITH tok AS (SELECT doc_id, source,
      |    string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
      |  FROM documents),
      |tw AS (SELECT doc_id, source,
      |    ('0x' || substr(md5(w), 1, 8))::BIGINT % 10000 AS b
      |  FROM (SELECT doc_id, source, unnest(t) AS w FROM tok)),
      |tgt AS (SELECT b, count(*) AS ct FROM tw WHERE source = 'src0' GROUP BY b),
      |srcb AS (SELECT b, count(*) AS cs FROM tw GROUP BY b),
      |tot AS (SELECT (SELECT count(*) FROM tw WHERE source = 'src0') AS nt,
      |               (SELECT count(*) FROM tw) AS ns),
      |sc2 AS (SELECT tw.doc_id,
      |    CAST(round((ln((coalesce(tgt.ct, 0) + 1.0) / (tot.nt + 10000))
      |      - ln((srcb.cs + 1.0) / (tot.ns + 10000))) * 1000000.0) AS BIGINT) AS lrq
      |  FROM tw LEFT JOIN tgt USING (b) JOIN srcb USING (b) CROSS JOIN tot),
      |agg2 AS (SELECT doc_id, count(*) AS n_tokens, sum(lrq) AS s FROM sc2 GROUP BY doc_id),
      |dsir AS (SELECT d.doc_id, coalesce(agg2.n_tokens, 0) AS n_tokens,
      |  coalesce((CASE WHEN agg2.s >= 0 THEN (agg2.s + 50) // 100
      |                 ELSE -((-agg2.s + 50) // 100) END) / 10000.0, 0.0) AS dsir_logw
      |FROM documents d LEFT JOIN agg2 USING (doc_id))""".stripMargin

  val docDsirSql: String =
    dsirCtes + "\nSELECT doc_id, n_tokens, dsir_logw FROM dsir"

  /** DSIR resampling — the second half of the recipe: draw `k` documents
    * WITHOUT replacement with probability ∝ exp([[docDsir]] log-weight)
    * via the Gumbel-top-k identity (top-k of logw + Gumbel noise is an
    * exact weighted sample). The "noise" is deterministic — the same
    * md5-derived uniform both engines compute (`u = (h32('g|'||doc_id)
    * + 0.5)/2³²`, Gumbel `g = −ln(−ln u)`) — so the selection is
    * reproducible run-to-run and engine-to-engine, the property every
    * corpus-selection job needs for auditability. The key is rounded to
    * 1e-6 with a doc_id tiebreak before the cut (float-order
    * discipline, the [[docLmScore]] precedent).
    *
    * Scale shape: one narrow projection over the weight table, then
    * top-k — TakeOrderedAndProject, per-partition heaps, NO global
    * sort (the q3_topk pattern).
    */
  def docDsirSample(spark: SparkSession, sfDir: String, k: Int = 100): DataFrame =
    docDsir(spark, sfDir)
      .withColumn("u",
        (expr(h32Sql("concat('g|', doc_id)")) + lit(0.5)) / lit(4294967296.0))
      .withColumn("gkey", round(col("dsir_logw") - log(-log(col("u"))), 6))
      .orderBy(col("gkey").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("dsir_logw"), col("gkey"))

  val docDsirSampleSql: String =
    dsirCtes +
      """
        |SELECT doc_id, dsir_logw,
        |  round(dsir_logw - ln(-ln((('0x' || substr(md5('g|' || doc_id), 1, 8))::BIGINT
        |    + 0.5) / 4294967296.0)), 6) AS gkey
        |FROM dsir
        |ORDER BY gkey DESC, doc_id
        |LIMIT 100""".stripMargin

  /** Spark-SQL string literal for an [a-z0-9]-alphabet symbol (the only
    * alphabet [[normText]] emits) — escaped anyway for safety.
    */
  private def sqlLit(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Distributed BPE TRAINING — learn the first `merges` byte-pair merges
    * from corpus statistics (the other half of the tokenizer story:
    * [[docTokBpe]] applies a tokenizer; this one is how the tokenizer is
    * fit on the corpus in the first place, the Sennrich et al. 2016
    * algorithm every GPT/Llama vocab build runs).
    *
    * Each round: count adjacent symbol pairs over the DISTINCT-WORD table
    * (occurrences weighted by word frequency, overlapping positions
    * counted, exactly the reference algorithm), take the arg-max pair
    * (total tie order: count desc, left asc, right asc — deterministic on
    * any engine), and rewrite each word's symbol sequence by the greedy
    * leftmost non-overlapping fold.
    *
    * Scale shape: the corpus is touched ONCE (word-count groupBy); every
    * round after that runs on the distinct-word table, which Heaps' law
    * bounds orders of magnitude below corpus size (~10M rows at 100 TB vs
    * 10¹¹ docs). Per round: one explode+groupBy carrying slim
    * (l, r, partial-count) rows with map-side combine, one
    * TakeOrderedAndProject returning exactly ONE row to the driver (the
    * merge decision — the only driver-side state, `merges` rows total),
    * and a per-row fold rewrite with the plan re-checkpointed so lineage
    * stays O(1) per round ([[DedupOps.connectedComponents]] discipline).
    * No step is ever corpus-sized after the first scan.
    */
  def docBpeTrain(spark: SparkSession, sfDir: String): DataFrame =
    docBpeTrain(spark, sfDir, merges = 8)

  def docBpeTrain(spark: SparkSession, sfDir: String, merges: Int): DataFrame =
    docBpeTrainOf(Tables.documents(spark, sfDir), merges)

  /** Core over any frame with a `text` column — [[docChunkOf]] pattern. */
  def docBpeTrainOf(docs: DataFrame, merges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var cur = docs
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .select(expr("split(w, '')").as("seq"), col("wc"))
      .localCheckpoint(false)
    // EVERY round's checkpoint registers with the scope (not just the
    // final one): each round's collect materializes the current plan's
    // checkpoint blocks, and an untracked intermediate would sit cached
    // until an eventual GC (CacheHygieneSpec enforces this)
    graft.CacheScope.trackCheckpoints(cur)
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    // r14 (VERDICT #5 "argmax + checkpoint → one action"): each round is
    // ONE action, but under AQE every round's pair-count exchange
    // materializes as its own shuffle-stage job before the argmax job —
    // 2 scheduling waves per round on a table AQE has nothing to
    // re-optimize (the distinct-word table is Heaps-bounded and the agg
    // keys on symbol pairs, a bounded decision table; runtime
    // coalescing buys nothing a bounded table needs). Scope AQE off for
    // the merge loop only — the corpus-sized word-count pass above
    // stays under whatever the session configured, because round 1's
    // action materializes it inside the non-AQE window… so materialize
    // it EAGERLY first (one job, session conf intact), then loop.
    // Results are bit-identical either way; only scheduling changes.
    cur.count()
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    while (rank <= merges && !exhausted) {
      val top = cur
        .filter(size(col("seq")) >= 2)
        .select(col("wc"), explode(expr(
          """transform(sequence(0, size(seq) - 2), i ->
            |  struct(element_at(seq, i + 1) AS l, element_at(seq, i + 2) AS r))"""
            .stripMargin)).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("wc")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect() // exactly one row — the merge decision, never data
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((rank, l, r, l + r, cnt))
        cur = cur.select(expr(
          s"""aggregate(seq, CAST(array() AS ARRAY<STRING>), (acc, x) ->
             |  IF(size(acc) > 0 AND element_at(acc, -1) = ${sqlLit(l)}
             |       AND x = ${sqlLit(r)},
             |     concat(slice(acc, 1, size(acc) - 1), array(${sqlLit(l + r)})),
             |     concat(acc, array(x))))""".stripMargin).as("seq"), col("wc"))
          .localCheckpoint(false)
        graft.CacheScope.trackCheckpoints(cur)
        rank += 1
      }
    }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
    learned.toSeq.toDF("rank", "left", "right", "merged", "pair_count")
      .select(col("rank").cast("long").as("rank"), col("left"), col("right"),
        col("merged"), col("pair_count"))
  }
  // doc_bpe_train oracle: DuckDB SQL cannot express the data-dependent
  // iterative merge loop; tools/compare.py carries a from-scratch Python
  // reference (PY_ORACLES) and BpeTrainSpec pins known-corpus merges +
  // the max-pair-count monotonicity invariant. Driver gate: rows-only.

  /** Driver-checkable companion of [[docBpeTrain]] (r9): the round-1
    * argmax INPUT — adjacent character-pair counts over the
    * frequency-weighted distinct-word table, in the training loop's exact
    * decision order (count desc, left asc, right asc; the first output
    * row IS merge #1). The loop itself stays Python-oracled; this pins
    * the corpus-sized statistics pass it folds over, via plain SQL.
    */
  def docBpePairs0(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .select(expr("split(w, '')").as("seq"), col("wc"))
      .filter(size(col("seq")) >= 2)
      .select(col("wc"), explode(expr(
        """transform(sequence(0, size(seq) - 2), i ->
          |  struct(element_at(seq, i + 1) AS l, element_at(seq, i + 2) AS r))"""
          .stripMargin)).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("wc")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("l").asc, col("r").asc)
      .limit(100)

  val docBpePairs0Sql: String =
    """WITH wc AS (
      |  SELECT token AS w, count(*) AS wc FROM (
      |    SELECT unnest(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS token
      |    FROM documents)
      |  WHERE length(token) > 0 GROUP BY token),
      |p AS (
      |  SELECT substr(w, i, 1) AS l, substr(w, i + 1, 1) AS r, wc
      |  FROM (SELECT w, wc, unnest(generate_series(1, length(w) - 1)) AS i
      |        FROM wc WHERE length(w) >= 2))
      |SELECT l, r, CAST(sum(wc) AS BIGINT) AS pair_count
      |FROM p GROUP BY l, r
      |ORDER BY pair_count DESC, l ASC, r ASC
      |LIMIT 100""".stripMargin

  /** BPE tokenizer APPLICATION with the merges [[docBpeTrain]] just
    * learned — closing the tokenizer loop (train on the corpus, then
    * tokenize the corpus with the result, the exact two-step every vocab
    * build runs). Emits per doc the word count, the post-BPE symbol
    * count (= what the training run's token budget is charged), and the
    * alphabetic char count, so chars-per-token compression is an exact
    * integer ratio downstream.
    *
    * The merge table is `merges` rows of driver state (the ONLY
    * driver-side data — the decision rows docBpeTrain already returns);
    * the greedy leftmost non-overlapping rewrite (merge by merge in rank
    * order, composed as nested higher-order-function expressions) runs
    * ONCE PER DISTINCT WORD — the Heaps'-law table, orders of magnitude
    * below token instances — and the per-doc counts come from joining
    * exploded tokens against that vocabulary (broadcast at any realistic
    * vocab size). A first cut ran the fold per token INSTANCE: 9.4 s at
    * sf0.1 vs ~1 s for this shape — the same ratio a 100 TB corpus
    * would see, magnified.
    */
  def docBpeApply(spark: SparkSession, sfDir: String): DataFrame = {
    val merges = docBpeTrain(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    // chained rewrites: merge k applies to sequences already rewritten by
    // merges 1..k-1, exactly as in training
    val seqExpr = merges.foldLeft("split(w, '')") { case (inner, (_, l, r, lr)) =>
      s"""aggregate($inner, CAST(array() AS ARRAY<STRING>), (acc, x) ->
         |  IF(size(acc) > 0 AND element_at(acc, -1) = ${sqlLit(l)}
         |       AND x = ${sqlLit(r)},
         |     concat(slice(acc, 1, size(acc) - 1), array(${sqlLit(lr)})),
         |     concat(acc, array(x))))""".stripMargin
    }
    val tok = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
    val vocab = tok.select(col("w")).distinct()
      .withColumn("n_sym_w", size(expr(seqExpr)).cast("long"))
      .withColumn("n_chr_w", length(col("w")).cast("long"))
    tok.join(broadcast(vocab), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        sum(col("n_sym_w")).as("n_sym"),
        sum(col("n_chr_w")).as("n_alpha"))
  }
  // doc_bpe_apply oracle: Python reference in tools/compare.py (shares the
  // merge-learning helper with doc_bpe_train); driver gate: rows-only.

  /** Quality-classifier TRAINING in-engine — full-batch logistic
    * regression by gradient descent over the [[docGopherFilter]] feature
    * panel, labeled by its rule-based admit flag (the standard bootstrap:
    * distill hand rules into a smooth scorer, then threshold the scorer
    * where the rules are too brittle — the fastText-quality-classifier
    * recipe at corpus scale). [[docQualityLogit]] APPLIES a fixed-weight
    * gate; this is where such weights come from.
    *
    * Determinism discipline: the gradient and loss are accumulated as
    * micro-unit BIGINTs (each row's contribution quantized to 1e-6), so
    * the per-iteration reduction is FOLD-ORDER-FREE — the same weights
    * bit-for-bit on any partitioning, cluster size, or retry, which
    * float summation cannot promise. Weight updates are a fixed IEEE
    * sequence on the exact sums.
    *
    * Scale shape: the feature frame is computed once and staged
    * ([[graft.CacheScope.barrier]]); each iteration is ONE pass emitting
    * a 7-value integer aggregate (map-side combined) — driver state is
    * d+1 doubles per iteration, `iters` rows total. No step is ever
    * corpus-sized after the feature scan.
    */
  def docQualityTrain(spark: SparkSession, sfDir: String): DataFrame = {
    val (names, w, _, _) = docQualityTrainFit(spark, sfDir)
    import spark.implicits._
    names.zip(w).toSeq.toDF("feature", "weight")
  }

  /** Fit core: returns (feature names, weights, per-iteration mean
    * logloss in micro-nats, n rows) — the spec asserts on the trace.
    */
  def docQualityTrainFit(spark: SparkSession, sfDir: String,
                         iters: Int = 15, lr: Double = 2.0)
      : (Array[String], Array[Double], Seq[Double], Long) = {
    val names = Array("bias", "len", "wordlen", "stop", "uniq", "rep")
    val feats = docGopherFilter(spark, sfDir).select(
      lit(1.0).as("x0"),
      (least(col("n_tokens"), lit(200)).cast("double") / 200.0).as("x1"),
      (least(col("avg_token_len"), lit(10.0)) / 10.0).as("x2"),
      (least(col("n_stop"), lit(20)).cast("double") / 20.0).as("x3"),
      col("uniq_ratio").as("x4"),
      col("rep_ratio").as("x5"),
      col("admit").cast("double").as("y"))
      .transform(graft.CacheScope.barrier) // one feature scan, iters passes
    val n = feats.count()
    val w = Array.fill(names.length)(0.0)
    val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
    // r14 note (VERDICT #5, attempted and REVERTED): routing the weights
    // through a broadcast 1-row frame (iteration-invariant generated
    // code, codegen-cache hits) measured WORSE than the literal form —
    // 2.33 → 2.98 s median at sf0.1 with jit_ms unchanged (81.3 → 78.9 s
    // — the JIT total is session background, not per-iteration codegen),
    // because the per-iteration BroadcastExchange + BNLJ costs more than
    // the re-planning it saves. Left as literals.
    //
    // What DID pay (VERDICT #5 "GD gradient + loss → one agg" taken one
    // step further): the gradient and loss were already one aggregate,
    // but under AQE that aggregate's SinglePartition exchange
    // materializes as its own job before the result job — 2 scheduling
    // waves per iteration for a plan AQE cannot improve (a global
    // aggregate's final stage is one partition at ANY scale; there is
    // nothing to coalesce). AQE is scoped off for the loop only; the
    // corpus-sized feature scan above materializes under the session
    // conf via the count. Results are bit-identical; only scheduling
    // changes (jobs per iteration 2 → 1).
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (_ <- 1 to iters) {
        val z = (0 until names.length)
          .map(j => s"(${w(j)}) * x$j").mkString(" + ")
        val agg = feats
          .withColumn("p", expr(s"1.0 / (1.0 + exp(-($z)))"))
          .withColumn("e", col("p") - col("y"))
          .select(
            (0 until names.length).map(j =>
              sum(expr(s"CAST(round(1e6 * e * x$j) AS BIGINT)")).as(s"g$j")) :+
            sum(expr(
              """CAST(round(-1e6 * (y * ln(p + 1e-12)
                |  + (1.0 - y) * ln(1.0 - p + 1e-12))) AS BIGINT)""".stripMargin))
              .as("loss"): _*)
          .head()
        losses += agg.getLong(names.length).toDouble / 1e6 / n.toDouble
        for (j <- 0 until names.length)
          w(j) -= lr * (agg.getLong(j).toDouble / 1e6) / n.toDouble
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
    (names, w, losses.toSeq, n)
  }
  // doc_quality_train: iterative GD is not SQL-expressible and float
  // weights have no cross-engine oracle; driver gate records rows-only.
  // QualityTrainSpec pins loss decrease, determinism (integer-grid
  // gradients), and accuracy above the majority-class baseline.

  /** Feature-hashed document embeddings (Weinberger et al. ICML'09, the
    * fastText/Vowpal-Wabbit input layer): every token lands in one of 64
    * dimensions by hash, with a second hash choosing ±1 sign so
    * collisions cancel in expectation — turning raw text into the
    * fixed-width vectors the `emb_*` family consumes, with NO vocabulary
    * to build, broadcast, or keep in sync (the property that matters at
    * 100 TB: the map is stateless, so re-sharding, retries, and corpus
    * growth cannot skew it). Output is the SPARSE form (doc_id, dim,
    * signed integer weight, zero rows dropped) — exact BIGINTs, directly
    * joinable or pivotable to dense.
    *
    * Scale shape: one explode + one (doc_id, dim)-keyed aggregation with
    * map-side combine — the [[docNgramFreq]] exchange pattern, carrying
    * 24-byte rows, never text. Everything is engine-portable md5
    * arithmetic, so the DuckDB twin is exact.
    */
  def docEmbedHash(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("doc_id"),
        expr(s"${h32Sql("concat('fh|', w)")} % 64").as("dim"),
        expr(s"IF(${h32Sql("concat('fs|', w)")} % 2 = 0, 1L, -1L)").as("sgn"))
      .groupBy(col("doc_id"), col("dim"))
      .agg(sum(col("sgn")).as("wgt"))
      .filter(col("wgt") =!= 0)

  /** Windowed co-occurrence PMI — the word-association table behind
    * word2vec-era statistics, collocation extraction, and compound-term
    * detection: count unordered token pairs within a ±2 skip-gram
    * window, keep the top 100 by count, and score each with pointwise
    * mutual information ln(c_xy·T² / (P·c_x·c_y)). Every count is an
    * exact BIGINT; the single ln-of-exact-ratio is rounded to the 1e-6
    * grid on both engines (the [[docDsirSample]] discipline).
    *
    * Scale shape: the pair explode is ≤ 2 slim rows per token (two
    * short strings), folded by a map-side-combined count; the top-100
    * cut is TakeOrderedAndProject (per-partition heaps, no global
    * sort); unigram counts join the 100 survivors via broadcast and the
    * two scalar totals ride 1-row broadcast attaches.
    */
  def docPmiTop(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(expr("filter(split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' '), w -> length(w) > 0)").as("t"))
      .transform(graft.CacheScope.barrier) // pairs + unigrams + total share it
    val pairs = toks.filter(size(col("t")) >= 2)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(t) - 2), i ->
          |  transform(sequence(i + 1, least(i + 2, size(t) - 1)), j ->
          |    struct(IF(element_at(t, i + 1) <= element_at(t, j + 1),
          |              element_at(t, i + 1), element_at(t, j + 1)) AS a,
          |           IF(element_at(t, i + 1) <= element_at(t, j + 1),
          |              element_at(t, j + 1), element_at(t, i + 1)) AS b))))"""
          .stripMargin)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val cnt = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_xy"))
      .transform(graft.CacheScope.barrier) // top cut + pair total share it
    val top = cnt.orderBy(col("c_xy").desc, col("a"), col("b")).limit(100)
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_w"))
    val tTok = toks.agg(sum(size(col("t"))).as("t_tok"))
    val pTot = cnt.agg(sum(col("c_xy")).as("p_tot"))
    top
      .join(broadcast(uni.select(col("w").as("a"), col("c_w").as("c_x"))), Seq("a"))
      .join(broadcast(uni.select(col("w").as("b"), col("c_w").as("c_y"))), Seq("b"))
      .crossJoin(broadcast(tTok)) // 1-row scalar attach (whitelisted shape)
      .crossJoin(broadcast(pTot))
      .select(col("a"), col("b"), col("c_xy"),
        expr("""round(ln(CAST(c_xy AS DOUBLE) * CAST(t_tok AS DOUBLE) * CAST(t_tok AS DOUBLE)
               |  / (CAST(p_tot AS DOUBLE) * CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE))), 6)"""
          .stripMargin).as("pmi"))
  }

  val docPmiTopSql: String =
    """WITH tok AS (
      |  SELECT list_filter(string_split(trim(
      |      regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
      |    w -> length(w) > 0) AS t
      |  FROM documents),
      |pl AS (
      |  SELECT unnest(flatten(list_transform(range(1, greatest(len(t) - 1, 0) + 1), i ->
      |    list_transform(range(i + 1, least(i + 2, len(t)) + 1), j ->
      |      struct_pack(
      |        a := CASE WHEN t[i] <= t[j] THEN t[i] ELSE t[j] END,
      |        b := CASE WHEN t[i] <= t[j] THEN t[j] ELSE t[i] END))))) AS p
      |  FROM tok),
      |pr AS (SELECT p.a AS a, p.b AS b FROM pl),
      |cnt AS (SELECT a, b, count(*) AS c_xy FROM pr GROUP BY a, b),
      |top AS (SELECT * FROM cnt ORDER BY c_xy DESC, a, b LIMIT 100),
      |uni AS (SELECT w, count(*) AS c_w
      |        FROM (SELECT unnest(t) AS w FROM tok) GROUP BY w),
      |tot AS (SELECT CAST(sum(len(t)) AS BIGINT) AS t_tok FROM tok),
      |pt AS (SELECT CAST(sum(c_xy) AS BIGINT) AS p_tot FROM cnt)
      |SELECT top.a, top.b, top.c_xy,
      |  round(ln(CAST(c_xy AS DOUBLE) * CAST(t_tok AS DOUBLE) * CAST(t_tok AS DOUBLE)
      |    / (CAST(p_tot AS DOUBLE) * CAST(ux.c_w AS DOUBLE) * CAST(uy.c_w AS DOUBLE))), 6) AS pmi
      |FROM top
      |JOIN uni ux ON top.a = ux.w
      |JOIN uni uy ON top.b = uy.w
      |CROSS JOIN tot CROSS JOIN pt""".stripMargin

  val docEmbedHashSql: String =
    """SELECT doc_id, dim, wgt FROM (
      |  SELECT doc_id,
      |    ('0x' || substr(md5('fh|' || w), 1, 8))::BIGINT % 64 AS dim,
      |    CAST(sum(CASE WHEN ('0x' || substr(md5('fs|' || w), 1, 8))::BIGINT % 2 = 0
      |             THEN 1 ELSE -1 END) AS BIGINT) AS wgt
      |  FROM (SELECT doc_id, unnest(string_split(trim(
      |          regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS w
      |        FROM documents)
      |  WHERE length(w) > 0
      |  GROUP BY doc_id, dim)
      |WHERE wgt != 0""".stripMargin
}
