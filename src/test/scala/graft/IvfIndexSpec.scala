package graft

import org.apache.spark.sql.Row
import graft.operators.VectorOps

/** Persisted IVF-PQ index lifecycle (round-9 verdict #4): build writes a
  * loadable cell-partitioned index, the query pass reproduces the fused
  * `emb_ivf_pq` rows exactly from the persisted artifacts, and a second
  * query REUSES the index instead of rebuilding (the amortization the
  * split exists for).
  */
class IvfIndexSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def withIndexDir[T](body: String => T): T = {
    val dir = s"/tmp/graft-index-spec-${System.nanoTime()}"
    sys.props("graft.index.dir") = dir
    try body(dir)
    finally {
      sys.props.remove("graft.index.dir")
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
    }
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.orderBy("q_id", "rank").collect().toSeq

  test("query against the persisted index == fused emb_ivf_pq, and reuse skips the rebuild") {
    withIndexDir { _ =>
      val fused = sortedRows(VectorOps.embIvfPq(spark, sf))
      val viaIndex = sortedRows(VectorOps.embIvfQuery(spark, sf)) // builds on miss
      assert(viaIndex == fused)

      // reuse: the codes table's success marker must be untouched by a
      // second query (same corpus fingerprint => same dir, no rebuild)
      val marker = new org.apache.hadoop.fs.Path(
        s"${VectorOps.ivfIndexDir(spark, sf)}/codes.parquet/_SUCCESS")
      val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val mtime = fs.getFileStatus(marker).getModificationTime
      val again = sortedRows(VectorOps.embIvfQuery(spark, sf))
      assert(again == fused)
      assert(fs.getFileStatus(marker).getModificationTime == mtime,
        "second query must reuse the persisted index, not rebuild it")
    }
  }

  test("a tampered index fails loudly by name, not by oracle mismatch") {
    withIndexDir { _ =>
      VectorOps.embIvfQuery(spark, sf).collect() // builds + verifies clean
      spark.catalog.clearCache(); CacheScope.release()
      val dir = VectorOps.ivfIndexDir(spark, sf)
      val cb = new org.apache.hadoop.fs.Path(s"$dir/codebooks.parquet")
      val fs = cb.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // truncate the codebooks artifact: drop one data file — the row
      // count no longer matches the manifest's build-time read-back
      val parts = fs.listStatus(cb).filter(_.getPath.getName.startsWith("part-"))
      assert(parts.nonEmpty)
      fs.delete(parts.head.getPath, false)
      val e = intercept[IllegalStateException](
        VectorOps.embIvfQuery(spark, sf).collect())
      assert(e.getMessage.contains("manifest"))
      assert(e.getMessage.contains("codebooks"))
      spark.catalog.clearCache(); CacheScope.release()
    }
  }

  test("a manifest-less index (half-written or foreign) is a named error") {
    withIndexDir { _ =>
      VectorOps.embIvfQuery(spark, sf).collect()
      spark.catalog.clearCache(); CacheScope.release()
      val mf = new org.apache.hadoop.fs.Path(
        s"${VectorOps.ivfIndexDir(spark, sf)}/manifest.json")
      val fs = mf.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(mf, false)
      val e = intercept[IllegalStateException](
        VectorOps.embIvfQuery(spark, sf).collect())
      assert(e.getMessage.contains("manifest.json missing"))
      spark.catalog.clearCache(); CacheScope.release()
    }
  }

  test("build stats cover every vector exactly once across cells") {
    withIndexDir { _ =>
      val stats = VectorOps.embIvfBuild(spark, sf).collect()
      val nVecs = Tables.embeddings(spark, sf).count()
      assert(stats.map(_.getLong(1)).sum == nVecs)
      assert(stats.map(_.getLong(0)).distinct.length == stats.length)
      // the index layout is one directory per cell (the probe's pruning unit)
      val codes = new org.apache.hadoop.fs.Path(
        s"${VectorOps.ivfIndexDir(spark, sf)}/codes.parquet")
      val fs = codes.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val cellDirs = fs.listStatus(codes).filter(_.isDirectory)
        .map(_.getPath.getName).filter(_.startsWith("cell="))
      assert(cellDirs.length == stats.length)
    }
  }
}
