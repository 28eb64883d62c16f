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
}
