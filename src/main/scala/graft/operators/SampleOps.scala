package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
