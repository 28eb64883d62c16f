package graft

import org.apache.spark.sql.SparkSession
import graft.functions.{BloomFns, CosineSimilarity, JaccardSimilarity, L2Distance, WinnowKernel}

/** Library entry point: one call wires everything a session needs —
  * the native codegen'd expressions (`cosine_sim`, `jaccard_sorted`,
  * `winnow_fp`, `l2_sq`, `bloom_might_contain`),
  * the typed UDAF (`weighted_avg`), and the parquet nanos setting the
  * `events` table requires. Individual operators also self-register what
  * they use, so calling this is convenience, not a correctness
  * prerequisite.
  */
object Graft {

  def init(spark: SparkSession): SparkSession = {
    CosineSimilarity.register(spark)
    JaccardSimilarity.register(spark)
    WinnowKernel.register(spark)
    L2Distance.register(spark)
    BloomFns.register(spark)
    spark.udf.register("weighted_avg",
      org.apache.spark.sql.functions.udaf(graft.functions.WeightedAvg))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }
}
