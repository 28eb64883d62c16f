package graft.io

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Co-located joins via bucketing — the pay-the-shuffle-once primitive for
  * recurring joins at 100 TB (SCALE.md §bucketing). The assertion is the
  * plan shape: two tables bucketed on the join key with equal bucket
  * counts must join with ZERO shuffle exchanges.
  */
class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("equi-bucketed tables join with zero exchanges") {
    FileIO.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity", "l_extendedprice"),
      "li_bucketed", buckets = 4, cols = Seq("l_orderkey"))
    FileIO.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
      "ord_bucketed", buckets = 4, cols = Seq("o_orderkey"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"), max(col("o_totalprice")).as("price"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"bucketed join must be shuffle-free, found:\n${shuffles.mkString("\n")}")
      assert(joined.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
