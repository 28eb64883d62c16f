package graft

import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** The fused CDC kernel ([[graft.functions.CdcChunks]]) against the HOF
  * reference formulation of the same boundary rule: identical (doc_id,
  * chunk) multisets on the real corpus, plus the short-string edge cases
  * the `sequence(4, n)` guard exists for. The DuckDB oracle is the same
  * reference formulation in DuckDB dialect, so kernel == ref here plus
  * ref == DuckDB in the driver gate closes kernel == oracle.
  */
class CdcKernelSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("kernel chunks == HOF reference chunks on the corpus") {
    val docs = Tables.documents(spark, sf)
    val kernel = DedupOps.cdcChunks(docs)
      .groupBy("doc_id", "chunk").count()
    val ref = DedupOps.cdcChunksRef(docs)
      .groupBy("doc_id", "chunk").count()
    assert(kernel.exceptAll(ref).isEmpty && ref.exceptAll(kernel).isEmpty,
      "kernel and reference chunking diverge")
    val n = kernel.count()
    info(s"$n distinct (doc, chunk, count) rows, kernel == reference")
    assert(n > 0)
  }

  test("edge cases: empty, shorter-than-window, and boundary-free strings") {
    import spark.implicits._
    val docs = Seq(
      (1L, ""),            // empty → zero chunks (row drops at explode)
      (2L, "ab"),          // < 4 chars → one whole-text chunk
      (3L, "abc"),         // exactly window-1
      (4L, "abcd"),        // exactly one window
      (5L, "zzzz zzzz zzzz") // uniform text, likely boundary-free
    ).toDF("doc_id", "text")
    val kernel = DedupOps.cdcChunks(docs).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val ref = DedupOps.cdcChunksRef(docs).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(kernel == ref, s"edge divergence: $kernel vs $ref")
    assert(!kernel.exists(_._1 == 1L), "empty doc must contribute no chunk")
    assert(kernel.filter(_._1 == 2L).map(_._2) == Seq("ab"))
    // chunks partition the normalized text exactly
    kernel.groupBy(_._1).foreach { case (_, cs) =>
      assert(cs.forall(_._2.nonEmpty))
    }
  }

  test("chunks reconcatenate to the normalized text per doc") {
    val docs = Tables.documents(spark, sf).limit(50)
    val rebuilt = DedupOps.cdcChunks(docs)
      .groupBy("doc_id")
      // explode preserves array order within a doc only per-partition; use
      // the ref's property instead: concat of chunks in emitted order. The
      // kernel emits in order, so collect_list within one task is ordered —
      // docs are narrow rows, each doc's chunks come from one input row.
      .agg(concat_ws("", collect_list(col("chunk"))).as("glued"))
    val orig = docs.select(col("doc_id"),
      graft.functions.TextFns.normText(col("text")).as("norm"))
    val bad = rebuilt.join(orig, "doc_id")
      .filter(col("glued") =!= col("norm")).count()
    assert(bad == 0, s"$bad docs whose chunks do not reconcatenate")
  }
}
