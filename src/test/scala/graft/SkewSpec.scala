package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted-join result identity: spreading a hot key over salt sub-keys and
  * replicating the right side must change the PLAN, never the RESULT.
  */
class SkewSpec extends SparkSpec {

  test("saltedJoin == plain equijoin on a 90%-hot-key distribution") {
    val s = spark
    import s.implicits._
    // 10k rows, ~90% on key "hot"
    val left = spark.range(0, 10000)
      .select(col("id"),
        when(pmod(col("id"), lit(10)) < 9, lit("hot"))
          .otherwise(concat(lit("k"), pmod(col("id"), lit(7)))).as("k"))
    val right = Seq(("hot", 1.0), ("k0", 2.0), ("k3", 3.0), ("zz", 9.0))
      .toDF("k", "w")
    val plain = left.join(right, Seq("k"))
      .select(col("id"), col("k"), col("w"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val salted = Skew.saltedJoin(left, right, "k", salt = 8)
      .select(col("id"), col("k"), col("w"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(salted == plain && plain.nonEmpty)
    // the hot key really spreads: its left rows land on several sub-keys
    val spread = left.filter(col("k") === "hot")
      .withColumn("__salt", pmod(hash(col("k"), monotonically_increasing_id()), lit(8)))
      .select("__salt").distinct().count()
    assert(spread > 1, s"salt must spread the hot key, got $spread sub-key(s)")
  }

  test("AQE splits a skewed join partition at runtime (the SCALE.md claim)") {
    // 95% of left rows share one key -> one shuffle partition dwarfs the
    // rest; with the skew thresholds scaled to test volume, the final
    // adaptive plan must read that partition as multiple skew-split slices
    val restore = Seq(
      "spark.sql.adaptive.enabled" -> spark.conf.getOption("spark.sql.adaptive.enabled"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.getOption("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
        spark.conf.getOption("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.adaptive.autoBroadcastJoinThreshold" ->
        spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      // forbid broadcast so the join stays shuffle-based and skew-splittable
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val left = spark.range(0, 200000)
        .select(col("id"),
          when(pmod(col("id"), lit(20)) < 19, lit("hot"))
            .otherwise(concat(lit("k"), pmod(col("id"), lit(97)))).as("k"))
      val right = spark.range(0, 200)
        .select(concat(lit("k"), col("id")).as("k"), lit(1.0).as("w"))
          .union(spark.range(0, 1).select(lit("hot").as("k"), lit(2.0).as("w")))
      val joined = left.join(right, Seq("k"))
      // execute THIS frame's QueryExecution (count()/a sink write would
      // plan their own clone and leave this one isFinalPlan=false)
      assert(joined.collect().length == 200000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected a skew-split join in the final adaptive plan:\n$finalPlan")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
