package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.MergeOps

/** Incrementally maintained table from a changelog stream — the
  * `foreachBatch` + MERGE pattern: each micro-batch of change rows is
  * applied to a parquet-backed base table with `MergeOps.applyChangelog`
  * (latest-per-key wins, delete ops drop rows), and the result is
  * promoted by rename-aside (write `<path>_next`, move the old table to
  * `<path>_prev`, move `_next` into place — the same discipline as
  * `FileIO.compact`). The two renames are NOT one atomic step: a crash
  * between them leaves no table at `path`; recovery is manual — rename
  * `<path>_prev` back to `path` (the pre-batch state; the batch replays
  * from the checkpoint). Readers racing the swap window can likewise see
  * a missing path. True atomic promotion needs a table format (snapshot
  * pointer) or a versioned-directory indirection. This is the
  * streaming face of the batch upsert — the state lives in the TABLE,
  * not the state store, so it survives query restarts and is readable
  * by any consumer mid-stream.
  *
  * Scale notes: each batch costs one key-shuffle join of base ⋈ batch
  * (AQE broadcasts the batch side — the common case); the rewrite cost
  * is the table itself, which is what table formats amortize with
  * file-level MERGE — at 100 TB you partition `path` and rewrite only
  * affected partitions, or hand the same plan to a table format. The
  * swap is the `FileIO.compact` promotion discipline (never
  * delete-before-promote).
  */
object UpsertSink {

  /** Start maintaining `path` from `changes`. `keys`/`opCol`/`seqCol`
    * as in [[MergeOps.applyChangelog]]. The base schema must already
    * exist at `path` (seed it with an empty or initial write).
    */
  def start(changes: DataFrame, path: String, keys: Seq[String],
            opCol: String, seqCol: String, checkpoint: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch.sparkSession, batch, path, keys, opCol, seqCol)
      }
      .start()

  private[streaming] def applyBatch(spark: SparkSession, batch: DataFrame,
                                    path: String, keys: Seq[String],
                                    opCol: String, seqCol: String): Unit = {
    import org.apache.hadoop.fs.Path
    if (batch.isEmpty) return
    val base = spark.read.parquet(path)
    val next = MergeOps.applyChangelog(base, batch, keys, opCol, seqCol)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path.stripSuffix("/") + "_next")
    val old = new Path(path.stripSuffix("/") + "_prev")
    next.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(old, true)
    if (!fs.rename(new Path(path), old))
      sys.error(s"upsert sink: could not move $path aside")
    if (!fs.rename(tmp, new Path(path))) {
      fs.rename(old, new Path(path))
      sys.error(s"upsert sink: could not promote $tmp (original restored)")
    }
    fs.delete(old, true)
  }
}
