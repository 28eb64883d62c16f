package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns.h32Sql

/** Deterministic sampling over the `documents` table — the
  * corpus-downsampling layer of a training-data pipeline (per-language
  * mixing rates, fixed-size eval splits). Everything here is HASH-driven,
  * not RNG-driven: a doc's fate depends only on its id, so samples are
  * reproducible across runs/engines (bit-exact DuckDB oracles) and stable
  * under corpus growth — re-running on an updated 100 TB corpus keeps
  * every previously-sampled surviving doc, which RNG sampling cannot do.
  */
object SampleOps {

  /** Stratified Bernoulli sampling with per-language rates (downsample the
    * dominant language, keep the rest at a higher rate — the standard
    * mixture-rebalancing step). Keep iff h32('smp|' || doc_id) % 100 <
    * rate(lang). Narrow, zero exchanges: the filter fuses into the scan,
    * so at 100 TB this costs one pass and writes only the survivors.
    */
  def docSampleStrat(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("bucket",
        expr(s"${h32Sql("concat('smp|', cast(doc_id as string))")} % 100"))
      .filter(col("bucket") <
        when(col("lang") === "en", lit(10)).otherwise(lit(50)))
      .select(col("doc_id"), col("lang"), col("bucket"))

  val docSampleStratSql: String =
    """SELECT doc_id, lang, bucket FROM (
      |  SELECT doc_id, lang,
      |    ('0x' || substr(md5('smp|' || doc_id), 1, 8))::BIGINT % 100 AS bucket
      |  FROM documents)
      |WHERE bucket < CASE WHEN lang = 'en' THEN 10 ELSE 50 END""".stripMargin

  /** Exactly-k uniform sample: the k docs with the smallest id-hash — a
    * deterministic reservoir (every doc equally likely under the hash's
    * uniformity, sample size exact, order-free). Runs as
    * TakeOrderedAndProject: per-partition top-k then a k-row merge on the
    * driver — no global sort, no full shuffle, scale-safe for k ≪ N.
    */
  def docSampleTopK(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("hk",
        expr(s"${h32Sql("concat('topk|', cast(doc_id as string))")}"))
      .orderBy(col("hk"), col("doc_id"))
      .limit(60)
      .select(col("doc_id"), col("lang"), col("hk"))

  val docSampleTopKSql: String =
    """SELECT doc_id, lang, hk FROM (
      |  SELECT doc_id, lang,
      |    ('0x' || substr(md5('topk|' || doc_id), 1, 8))::BIGINT AS hk
      |  FROM documents)
      |ORDER BY hk, doc_id LIMIT 60""".stripMargin

  /** Deterministic train/val/test split (90/5/5): the terminal step of a
    * data pipeline. Hash-assigned per doc id, so membership is stable
    * under corpus growth and reshuffles — a doc NEVER migrates between
    * splits across pipeline reruns, which is what keeps eval sets
    * uncontaminated. Pure projection, zero exchanges; downstream writers
    * partition by `split`.
    */
  def docSplit(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("bucket",
        expr(s"${h32Sql("concat('split|', cast(doc_id as string))")} % 100"))
      .select(col("doc_id"), col("lang"),
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "val")
          .otherwise("test").as("split"))

  val docSplitSql: String =
    """SELECT doc_id, lang,
      |  CASE WHEN bucket < 90 THEN 'train'
      |       WHEN bucket < 95 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM (
      |  SELECT doc_id, lang,
      |    ('0x' || substr(md5('split|' || doc_id), 1, 8))::BIGINT % 100 AS bucket
      |  FROM documents)""".stripMargin

  /** Quality-weighted Bernoulli sampling: each doc's acceptance
    * probability is its own quality signal (token distinctness here —
    * repetitive docs get downweighted), the corpus-mixing primitive
    * behind "sample high-quality sources more". All math is integer:
    * p in basis points = (10000 * n_distinct) div n_tokens, keep iff
    * h32('wsmp|' || id) % 10000 < p — no float rounding to diverge
    * between engines, and the div-by-zero guard handles empty docs.
    * Narrow per-row work; the filter fuses into the scan (zero
    * exchanges), so at 100 TB this is one pass writing survivors.
    */
  def docSampleWeighted(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("t", graft.functions.TextFns.tokens(col("text")))
      .withColumn("p_bps",
        expr("IF(size(t) = 0, 0L, (10000L * size(array_distinct(t))) div size(t))"))
      .withColumn("h",
        expr(s"${h32Sql("concat('wsmp|', cast(doc_id as string))")} % 10000"))
      .filter(col("h") < col("p_bps"))
      .select(col("doc_id"), col("lang"), col("p_bps"), col("h"))

  val docSampleWeightedSql: String =
    """SELECT doc_id, lang, p_bps, h FROM (
      |  SELECT doc_id, lang,
      |    CASE WHEN len(t) = 0 THEN 0
      |         ELSE (10000 * len(list_distinct(t))) // len(t) END AS p_bps,
      |    ('0x' || substr(md5('wsmp|' || doc_id), 1, 8))::BIGINT % 10000 AS h
      |  FROM (SELECT doc_id, lang,
      |          string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS t
      |        FROM documents))
      |WHERE h < p_bps""".stripMargin

  /** Mixture rebalancing — deterministic downsampling to a target
    * language mixture (the DoReMi/The-Pile-style domain-weights step:
    * given target proportions, keep the largest corpus whose language
    * shares hit them exactly). The binding language (smallest
    * nₗ/wₗ) is kept whole; every other language is hash-thinned to its
    * proportional target. ALL rate arithmetic is integer (basis
    * points × a floor-divided scale), so both engines compute identical
    * per-language keep thresholds and the md5 bucket test is exact.
    *
    * Scale shape: one slim (lang, count) aggregate; the 1-row scale
    * minimum broadcasts back (the intended nested loop); the per-lang
    * rate table (≤ |langs| rows) broadcast-joins into a scan-fused
    * filter. The corpus itself never shuffles.
    */
  def docMixtureSample(spark: SparkSession, sfDir: String): DataFrame = {
    val wExpr = "CASE lang WHEN 'en' THEN 4000L WHEN 'es' THEN 1500L " +
      "WHEN 'fr' THEN 1500L WHEN 'de' THEN 1500L WHEN 'zh' THEN 1500L ELSE 0L END"
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"))
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
      .withColumn("w_bps", expr(wExpr))
      .filter(col("w_bps") > 0)
      .transform(graft.CacheScope.barrier) // scale min + rate table share the agg
    val scale = counts.agg(min(expr("n_l * 10000 div w_bps")).as("scale_x"))
    val rates = counts.crossJoin(broadcast(scale)) // 1-row scalar attach
      .withColumn("t_l", expr("w_bps * scale_x div 10000"))
      .withColumn("p_bps", expr("t_l * 10000 div n_l"))
      .select(col("lang"), col("p_bps"))
    docs.join(broadcast(rates), Seq("lang"))
      .filter(expr(s"${h32Sql("concat('mix|', cast(doc_id as string))")} % 10000") < col("p_bps"))
      .select(col("doc_id"), col("lang"))
  }

  val docMixtureSampleSql: String =
    """WITH c AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY lang),
      |w AS (SELECT lang, n_l,
      |    CASE lang WHEN 'en' THEN 4000 WHEN 'es' THEN 1500 WHEN 'fr' THEN 1500
      |              WHEN 'de' THEN 1500 WHEN 'zh' THEN 1500 ELSE 0 END AS w_bps
      |  FROM c),
      |s AS (SELECT min((n_l * 10000) // w_bps) AS scale_x FROM w WHERE w_bps > 0),
      |r AS (SELECT lang, ((w_bps * scale_x) // 10000) AS t_l, n_l
      |      FROM w CROSS JOIN s WHERE w_bps > 0),
      |p AS (SELECT lang, (t_l * 10000) // n_l AS p_bps FROM r)
      |SELECT d.doc_id, d.lang FROM documents d JOIN p USING (lang)
      |WHERE ('0x' || substr(md5('mix|' || doc_id), 1, 8))::BIGINT % 10000 < p.p_bps""".stripMargin

  /** Sequence packing (concat-and-chunk): lay documents end-to-end in
    * doc_id order within a language group and cut fixed-capacity
    * training sequences every `Capacity` tokens; emit each doc's start
    * offset, first chunk index, and how many chunks it straddles —
    * the metadata a loader needs to assemble packed sequences without
    * materializing them.
    *
    * Scale shape: one exchange — the running sum is a window
    * partitioned by `lang`, so it hash-distributes instead of
    * collapsing to a single partition the way a global-order pack
    * would. Within a group the offsets are a prefix sum in doc_id
    * order; cross-run determinism comes from the id ordering, not
    * arrival order. Packing quality (wasted tail tokens per group) is
    * bounded by Capacity per group, independent of corpus size.
    */
  val Capacity = 2048L

  def docPack(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, sfDir)
      .withColumn("n_tok", size(graft.functions.TextFns.tokens(col("text"))).cast("long"))
      .withColumn("cum_end", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("lang"), col("n_tok"),
        (col("cum_end") - col("n_tok")).as("start_off"),
        expr(s"(cum_end - n_tok) div $Capacity").as("first_chunk"),
        expr(s"IF(n_tok = 0, 0L, (cum_end - 1) div $Capacity - " +
          s"(cum_end - n_tok) div $Capacity + 1)").as("n_chunks"))
  }

  val docPackSql: String =
    """SELECT doc_id, lang, n_tok,
      |  CAST(sum(n_tok) OVER w - n_tok AS BIGINT) AS start_off,
      |  CAST((sum(n_tok) OVER w - n_tok) // 2048 AS BIGINT) AS first_chunk,
      |  CAST(CASE WHEN n_tok = 0 THEN 0
      |       ELSE (sum(n_tok) OVER w - 1) // 2048
      |          - (sum(n_tok) OVER w - n_tok) // 2048 + 1 END AS BIGINT) AS n_chunks
      |FROM (
      |  SELECT doc_id, lang,
      |    len(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS n_tok
      |  FROM documents)
      |WINDOW w AS (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING)""".stripMargin

  /** Deterministic global corpus shuffle — the "randomize training
    * order" step every pretraining run needs. Each doc's shuffle key is
    * a salted md5 of its id, and the op emits the doc's 1-based position
    * in the key-sorted order: a reproducible pseudorandom permutation
    * (same corpus → same order on any engine, cluster size, or retry).
    *
    * The global position is computed WITHOUT a global-order window
    * (`row_number() OVER (ORDER BY key)` collapses to ONE task — the
    * classic scale trap): the key's first hex byte buckets the corpus
    * into 256 ranges whose lexicographic order equals their numeric
    * order, a 256-row count aggregate turns into cumulative offsets
    * (a bounded 256-row window, independent of corpus size), and each
    * doc's position is its bucket offset plus its rank WITHIN the
    * bucket — 256 parallel window partitions. Two slim exchanges
    * (count agg + bucket repartition for the rank), both on
    * (bucket, key) rows, never the text. The downstream writer sorts
    * files by `pos` ranges — exactly how a 100 TB corpus gets a stable
    * epoch order.
    */
  def docShuffle(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"))
      .withColumn("skey", md5(concat(col("doc_id").cast("string"), lit(":shuf-v1"))))
      .withColumn("bucket", conv(substring(col("skey"), 1, 2), 16, 10).cast("int"))
    // 256-row histogram -> exclusive prefix sum; the window runs over a
    // bounded 256-row frame regardless of corpus size, then broadcasts
    val offs = d.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .withColumn("off",
        sum(col("n")).over(Window.orderBy(col("bucket"))) - col("n"))
      .select(col("bucket"), col("off"))
    // fixed-width lowercase-hex keys order identically as strings and as
    // numbers, so (bucket, skey) order == global skey order
    val wB = Window.partitionBy(col("bucket")).orderBy(col("skey"), col("doc_id"))
    d.join(broadcast(offs), Seq("bucket"))
      .withColumn("pos", col("off") + row_number().over(wB))
      .select(col("pos"), col("doc_id"), col("lang"))
  }

  val docShuffleSql: String =
    """SELECT row_number() OVER (ORDER BY md5(doc_id || ':shuf-v1'), doc_id) AS pos,
      |  doc_id, lang
      |FROM documents""".stripMargin

  /** Leakage-safe train/val/test split: hash-assign each NEAR-DUP CLUSTER
    * (not each doc) to a split, so a document and its near-duplicates can
    * never straddle the train/eval boundary — the failure mode that makes
    * held-out perplexity a lie ([[docSplit]] splits per-doc and has
    * exactly this leak when run before dedup). A doc's split key is its
    * cluster representative from [[DedupOps.dedupClusters]] (MinHash-LSH
    * components at Jaccard ≥ 0.5); singleton docs (no near-dup edge — the
    * overwhelming majority) key on their own id.
    *
    * Scale shape: the cluster label table only holds docs WITH a near-dup
    * edge (≪ corpus), so it broadcasts into a left join and the corpus
    * never shuffles; the split assignment itself is a scan-fused hash
    * projection, exactly like [[docSplit]].
    */
  def docSplitSafe(spark: SparkSession, sfDir: String): DataFrame = {
    val labels = DedupOps.dedupClusters(spark, sfDir)
      .select(col("doc_id"), col("cluster_id"))
    Tables.documents(spark, sfDir).select(col("doc_id"), col("lang"))
      .join(broadcast(labels), Seq("doc_id"), "left")
      .withColumn("rep_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("bucket",
        expr(s"${h32Sql("concat('ssplit|', cast(rep_id as string))")} % 100"))
      .select(col("doc_id"), col("lang"), col("rep_id"),
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "val")
          .otherwise("test").as("split"))
  }

  val docSplitSafeSql: String =
    s"""WITH RECURSIVE pairs AS (${DedupOps.minhashLshPairsSql}),
       |edges AS (SELECT a_id AS src, b_id AS dst FROM pairs WHERE jacc >= 0.5
       |          UNION ALL SELECT b_id, a_id FROM pairs WHERE jacc >= 0.5),
       |reach(v, l) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, r.l FROM reach r JOIN edges e ON e.src = r.v),
       |labels AS (SELECT v AS doc_id, min(l) AS cluster_id FROM reach GROUP BY v),
       |rep AS (
       |  SELECT d.doc_id, d.lang,
       |    coalesce(labels.cluster_id, d.doc_id) AS rep_id
       |  FROM documents d LEFT JOIN labels ON d.doc_id = labels.doc_id)
       |SELECT doc_id, lang, rep_id,
       |  CASE WHEN bucket < 90 THEN 'train'
       |       WHEN bucket < 95 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM (SELECT *,
       |        ('0x' || substr(md5('ssplit|' || rep_id), 1, 8))::BIGINT % 100 AS bucket
       |      FROM rep)""".stripMargin

  /** First-fit-decreasing sequence packing — the padding-minimizing
    * alternative to [[docPack]]'s concat-and-chunk: documents are NOT
    * split across training sequences; instead each shard's docs are
    * sorted longest-first and first-fit packed into `Capacity`-token
    * bins (FFD uses ≤ 11/9·OPT + 1 bins — near-optimal padding waste
    * without a solver). Oversized docs get a bin of their own (the
    * loader truncates). This is the packing mode used when sequences
    * must hold whole documents (no cross-doc attention contamination).
    *
    * Scale shape: packing is inherently sequential WITHIN a bin stream,
    * so the corpus is hash-sharded and each shard packs independently —
    * the exchange carries only (doc_id, n_tok) pairs, never text, and
    * shard count scales with the corpus (fixed here for oracle
    * determinism). Per-shard state is the open-bin fill array — bounded
    * by shard token mass / Capacity. The same algorithm is the oracle:
    * a from-scratch Python FFD in tools/compare.py (no SQL twin — FFD's
    * loop is not expressible in DuckDB SQL; driver gate records
    * rows-only, the local replica closes the hash, and SampleOpsSpec
    * pins fill bounds, determinism, and a hand-packed example).
    */
  val FfdShards = 32

  /** Pure FFD core: sort (length desc, id asc), first-fit each item into
    * the lowest-indexed bin with room; an item over capacity opens a bin
    * of its own that nothing else joins. Returns (id, bin, n) in
    * placement order. Property-tested in SampleOpsSpec (permutation,
    * fill bound, mass lower bound, first-fit waste guarantee) and
    * mirrored by the Python oracle.
    */
  private[graft] def ffdPack(items: Seq[(Long, Long)], cap: Long): Seq[(Long, Long, Long)] = {
    val sorted = items.sortBy { case (id, n) => (-n, id) }
    val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
    sorted.map { case (id, n) =>
      val i = fills.indexWhere(_ + n <= cap)
      val bin = if (i >= 0) { fills(i) += n; i }
        else { fills += n; fills.length - 1 } // oversize ⇒ own bin
      (id, bin.toLong, n)
    }
  }

  def docPackFfd(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cap = Capacity
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n_tok"),
        expr(s"${h32Sql("concat('ffd|', cast(doc_id as string))")} % $FfdShards")
          .as("shard"))
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroups { (shard: Long, it: Iterator[(Long, Long, Long)]) =>
        ffdPack(it.map(t => (t._1, t._2)).toSeq, cap).iterator
          .map { case (id, bin, n) => (id, shard, bin, n) }
      }
      .toDF("doc_id", "shard", "bin", "n_tok")
  }

  /** SQL-checkable companion of [[docPackFfd]] (round-9 verdict #7, the
    * `doc_bpe_pairs0` pattern): the FFD loop itself is not expressible
    * in SQL, but its ENTIRE per-shard input — each document's token
    * count, its shard, and its position in the (length desc, id asc)
    * decision order [[ffdPack]] consumes — is one window query. With
    * this row hash-green, the only logic the Python oracle alone covers
    * is the first-fit bin scan over an already-pinned sequence; a
    * divergence in tokenization, sharding, or sort order would surface
    * HERE, cross-engine, not just in the py-oracle replica.
    */
  def docPackFfdOrder(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("n_tok").desc, col("doc_id").asc)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n_tok"),
        expr(s"${h32Sql("concat('ffd|', cast(doc_id as string))")} % $FfdShards")
          .as("shard"))
      .withColumn("decision_rank", row_number().over(w).cast("long"))
      .select(col("shard"), col("decision_rank"), col("doc_id"), col("n_tok"))
  }

  val docPackFfdOrderSql: String =
    s"""SELECT shard, decision_rank, doc_id, n_tok FROM (
       |  SELECT doc_id, n_tok, shard,
       |    row_number() OVER (PARTITION BY shard
       |      ORDER BY n_tok DESC, doc_id ASC) AS decision_rank
       |  FROM (
       |    SELECT doc_id,
       |      len(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS n_tok,
       |      ('0x' || substr(md5('ffd|' || doc_id), 1, 8))::BIGINT % $FfdShards AS shard
       |    FROM documents))""".stripMargin
}
