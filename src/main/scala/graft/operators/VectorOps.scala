package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{CosineSimilarity, TextFns}
import graft.functions.TextFns.h32Sql

/** Similarity search over the `embeddings` table (`Array[Float]` column).
  *
  * Two tiers, mirroring what a 100 TB pipeline needs:
  *
  *   - `embKnn`: brute-force cosine top-k. The query side is tiny and
  *     broadcast; the corpus side streams — per-partition partial top-k via
  *     window rank. Exact baseline; O(|Q|·|corpus|).
  *   - `embNeardupLsh`: random-hyperplane LSH — 6 sign bits → bucket id →
  *     bucket-equijoin → exact cosine verification of candidates only.
  *     The join shuffles on bucket id, so work scales with bucket
  *     occupancy, not |corpus|²; more planes / multi-probe tighten recall
  *     at scale.
  *
  * All arithmetic is double-precision sequential fold (`aggregate`), which
  * the DuckDB oracle reproduces bit-for-bit (`list_sum` over
  * `list_transform`); hyperplanes are derived from the shared md5 hash so
  * both engines generate identical projections. No UDFs — everything is
  * Catalyst higher-order functions.
  */
object VectorOps {

  private val dims = 64

  private def withVec(df: DataFrame): DataFrame =
    df.withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))

  /** Brute-force cosine top-5 neighbors for query vectors (vec_id < 10). */
  def embKnn(spark: SparkSession, sfDir: String): DataFrame = {
    CosineSimilarity.register(spark)
    val e = withVec(Tables.embeddings(spark, sfDir))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val c = e.select(col("vec_id").as("n_id"), col("v").as("cv"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cos", expr("cosine_sim(qv, cv)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cos"), 6).as("cos"))
  }

  val embKnnSql: String =
    s"""WITH s AS (
       |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
       |  FROM embeddings),
       |n AS (
       |  SELECT vec_id, v,
       |    sqrt(list_sum(list_transform(range(1, ${dims + 1}), i -> v[i] * v[i]))) AS nrm
       |  FROM s),
       |scored AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |    list_sum(list_transform(range(1, ${dims + 1}), i -> q.v[i] * c.v[i]))
       |      / (q.nrm * c.nrm) AS cos
       |  FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
       |SELECT q_id, rank, n_id, round(cos, 6) AS cos FROM (
       |  SELECT q_id, n_id, cos,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
       |  FROM scored)
       |WHERE rank <= 5""".stripMargin

  /** Random-hyperplane LSH bucket id: 6 sign bits of md5-derived
    * projections (component p,i = (h32('p{p}_{i}') % 2001 - 1000)/1000).
    */
  private val bucketSql: String =
    s"""aggregate(sequence(0, 5), CAST(0 AS BIGINT), (acc, p) -> acc +
       |  IF(aggregate(sequence(0, ${dims - 1}), CAST(0 AS DOUBLE), (a, i) ->
       |       a + element_at(v, i + 1) *
       |           ((${h32Sql("concat('p', p, '_', i)")} % 2001 - 1000) / 1000.0)) > 0,
       |     shiftleft(CAST(1 AS BIGINT), p), CAST(0 AS BIGINT)))""".stripMargin

  /** LSH-bucketed near-duplicate pairs, exact-cosine-verified (>= 0.3). */
  def embNeardupLsh(spark: SparkSession, sfDir: String): DataFrame = {
    CosineSimilarity.register(spark)
    val e = withVec(Tables.embeddings(spark, sfDir))
      .withColumn("bucket", expr(bucketSql))
      .persist() // barrier: 384 digests/row computed once, not per join side
    val a = e.select(col("vec_id").as("a_id"), col("v").as("av"), col("bucket"))
    val b = e.select(col("vec_id").as("b_id"), col("v").as("bv"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", expr("cosine_sim(av, bv)"))
      .filter(col("cos") >= 0.3)
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos"))
      .distinct()
  }

  val embNeardupLshSql: String =
    s"""WITH n AS (
       |  SELECT vec_id, v,
       |    sqrt(list_sum(list_transform(range(1, ${dims + 1}), i -> v[i] * v[i]))) AS nrm,
       |    list_sum(list_transform(range(0, 6), p ->
       |      CASE WHEN list_sum(list_transform(range(0, $dims), i ->
       |             v[i + 1] * ((('0x' || substr(md5('p' || p || '_' || i), 1, 8))::BIGINT
       |                          % 2001 - 1000) / 1000.0))) > 0
       |           THEN (1::BIGINT << p) ELSE 0::BIGINT END)) AS bucket
       |  FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
       |        FROM embeddings))
       |SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id,
       |  round(list_sum(list_transform(range(1, ${dims + 1}), i -> a.v[i] * b.v[i]))
       |    / (a.nrm * b.nrm), 6) AS cos
       |FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE list_sum(list_transform(range(1, ${dims + 1}), i -> a.v[i] * b.v[i]))
       |    / (a.nrm * b.nrm) >= 0.3""".stripMargin
}
