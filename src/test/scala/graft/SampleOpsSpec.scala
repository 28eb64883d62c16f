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

  test("doc_pack_ffd: fills bounded, oversize isolated, bins near-optimal") {
    val out = SampleOps.docPackFfd(spark, sf).cache()
    try {
      assert(out.count() == Tables.documents(spark, sf).count())
      val cap = SampleOps.Capacity
      val bins = out.groupBy(col("shard"), col("bin"))
        .agg(sum(col("n_tok")).as("fill"), count(lit(1)).as("members"),
          max(col("n_tok")).as("mx")).cache()
      try {
        // every bin holding only cap-or-smaller docs respects capacity
        assert(bins.filter(col("mx") <= cap && col("fill") > cap).isEmpty,
          "a bin of packable docs exceeds capacity")
        // an oversize doc sits alone in its bin
        assert(bins.filter(col("mx") > cap && col("members") > 1).isEmpty,
          "an oversize doc shares a bin")
        // per shard: bins used ≥ the token-mass lower bound (sanity that
        // bins are actually packed, not one-doc-per-bin)
        val perShard = bins.groupBy(col("shard"))
          .agg(countDistinct(col("bin")).as("used"), sum(col("fill")).as("mass"))
          .withColumn("lb", expr(s"(mass + ${cap - 1}) div $cap"))
        assert(perShard.filter(col("used") < col("lb")).isEmpty,
          "bins used below the mass lower bound — impossible packing")
        // FFD packs within 2x of the lower bound (guaranteed by first-fit:
        // at most one bin can be under half full among non-oversize bins)
        assert(perShard.filter(col("used") > col("lb") * 2 + 1).isEmpty,
          "packing waste beyond the first-fit guarantee")
      } finally bins.unpersist()
    } finally out.unpersist()
  }

  test("doc_pack_ffd matches a hand-run of FFD on one shard") {
    // reproduce the algorithm in plain Scala for one shard and diff
    val docs = SampleOps.docPackFfd(spark, sf)
      .filter(col("shard") === 0).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val items = docs.map { case (id, _, n) => (id, n) }.sortBy { case (id, n) => (-n, id) }
    val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
    val expect = items.map { case (id, n) =>
      val i = fills.indexWhere(_ + n <= SampleOps.Capacity)
      val bin = if (i >= 0) { fills(i) += n; i } else { fills += n; fills.length - 1 }
      id -> bin.toLong
    }.toMap
    docs.foreach { case (id, bin, _) =>
      assert(expect(id) == bin, s"doc $id: expected bin ${expect(id)}, got $bin")
    }
  }

  test("doc_split_safe: near-dup cluster members never straddle splits") {
    val out = SampleOps.docSplitSafe(spark, sf).cache()
    try {
      // every rep group maps to exactly one split
      assert(out.groupBy(col("rep_id"))
        .agg(countDistinct(col("split")).as("k")).filter(col("k") > 1).isEmpty,
        "a cluster's members landed in different splits")
      // total coverage, and train is the dominant split
      val n = Tables.documents(spark, sf).count()
      assert(out.count() == n)
      val byS = out.groupBy(col("split")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byS.getOrElse("train", 0L) > byS.getOrElse("val", 0L))
      assert(byS.getOrElse("train", 0L) > byS.getOrElse("test", 0L))
    } finally { out.unpersist(); CacheScope.release() }
  }
}
