package graft

import org.apache.spark.sql.functions._
import graft.operators.SampleOps

/** Properties of the deterministic corpus shuffle: the emitted positions
  * form an exact permutation, agree with the naive global-order
  * definition, and are reproducible across runs.
  */
class SampleOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("doc_shuffle emits an exact 1..N permutation") {
    val out = SampleOps.docShuffle(spark, sf).cache()
    try {
      val n = Tables.documents(spark, sf).count()
      assert(out.count() == n)
      val stats = out.agg(
        countDistinct(col("pos")).as("d"),
        min(col("pos")).as("mn"), max(col("pos")).as("mx")).head()
      assert(stats.getLong(0) == n, "positions must be distinct")
      assert(stats.getLong(1) == 1L && stats.getLong(2) == n,
        s"positions must cover 1..$n, got [${stats.get(1)}, ${stats.get(2)}]")
    } finally out.unpersist()
  }

  test("doc_shuffle bucketed rank == the naive global-order definition") {
    // the 256-bucket prefix-sum construction must reproduce, row for row,
    // what a (scale-hostile) single global-order window would compute
    val naive = Tables.documents(spark, sf)
      .withColumn("skey", md5(concat(col("doc_id").cast("string"), lit(":shuf-v1"))))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("skey"), col("doc_id"))))
      .select(col("pos").cast("long"), col("doc_id"))
    val got = SampleOps.docShuffle(spark, sf).select(col("pos"), col("doc_id"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
      "bucketed construction diverged from the global-order definition")
  }

  test("doc_shuffle is deterministic across independent evaluations") {
    val a = SampleOps.docShuffle(spark, sf).collect().map(_.toSeq).toSet
    val b = SampleOps.docShuffle(spark, sf).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
