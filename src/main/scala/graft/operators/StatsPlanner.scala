package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}
import graft.CacheScope

/** Profiler → planner loop: table-level statistics computed by a
  * profiling pass drive a physical join-strategy decision, instead of
  * leaving it to static config.
  *
  * Why this exists: Spark's own size-based broadcast decision reads the
  * FILE size of the scan relation — after a selective filter or a
  * derived aggregation it has no idea how small the frame really is
  * until AQE observes a finished shuffle stage, and AQE can only
  * convert a join it is already inside the query for. A pipeline that
  * PROFILES its tables anyway (the ANALYZE surface, `q21_profile` /
  * `Relational.profile`) already paid for better information; this is
  * the consumer that turns those numbers into a plan choice at BUILD
  * time — the same loop a warehouse runs as ANALYZE → CBO.
  *
  * The stats are one codegen'd aggregate over the dimension (row count
  * + average widths of the variable-length columns; fixed-width columns
  * use their type's size). That pass costs one scan of the DIMENSION —
  * negligible against the fact-side join it sizes, and memoizable
  * across a scope via [[CacheScope.memo]] like every other staged
  * artifact.
  */
object StatsPlanner {

  /** Row count + estimated bytes/row of a frame. `sizeBytes` is an
    * in-memory estimate (8 B per fixed-width field via the type's
    * default size, profiled average length + 8 B overhead for
    * strings/binary, 8 B row overhead) — deliberately simple: the
    * decision it feeds has a ~4× safety margin built into the default
    * threshold, and a wrong-by-2× width estimate still beats the file
    * size of a pre-filter scan by orders of magnitude.
    */
  final case class TableStats(rows: Long, rowBytes: Double) {
    def sizeBytes: Long = (rows * rowBytes).toLong + 8
  }

  /** ONE aggregate job over `df`: count + avg length per var-width
    * column. Pass `memoKey` to stage the result for the scope (repeated
    * plan builds against the same table re-read the staged numbers).
    */
  def tableStats(df: DataFrame, memoKey: Option[String] = None): TableStats = {
    def compute(): TableStats = {
      val varCols = df.schema.fields
        .filter(f => f.dataType == StringType || f.dataType == BinaryType)
        .map(_.name).toSeq
      val aggs = count(lit(1)).as("__rows") +:
        varCols.map(c => avg(coalesce(length(col(c)).cast("double"), lit(0.0)))
          .as(s"__len_$c"))
      val r = df.agg(aggs.head, aggs.tail: _*).first()
      val rows = r.getAs[Long]("__rows")
      val width = df.schema.fields.map { f =>
        f.dataType match {
          case StringType | BinaryType =>
            8.0 + (if (rows == 0) 0.0
                   else Option(r.getAs[Any](s"__len_${f.name}"))
                     .map(_.asInstanceOf[Double]).getOrElse(0.0))
          case t => t.defaultSize.toDouble
        }
      }.sum
      TableStats(rows, width)
    }
    memoKey.map(k => CacheScope.memo(s"stats:$k")(compute())).getOrElse(compute())
  }

  /** Join `fact` ⋈ `dim` with the dim side's strategy chosen from its
    * profiled size: under the threshold → explicit broadcast (the
    * planner might not know — see scaladoc above); over it → a
    * SHUFFLE_HASH hint, which (a) overrides any file-size-based
    * broadcast the planner would wrongly pick for a filtered-but-huge
    * dim, and (b) skips the sort a merge join would pay, since the dim
    * side builds a per-partition hash map instead. Threshold defaults
    * to Spark's own 10 MB broadcast budget.
    */
  def statsJoin(fact: DataFrame, dim: DataFrame, joinExprs: Column,
                stats: TableStats,
                thresholdBytes: Long = 10L << 20): DataFrame =
    if (stats.sizeBytes <= thresholdBytes) fact.join(broadcast(dim), joinExprs)
    else fact.join(dim.hint("shuffle_hash"), joinExprs)

  /** Profile-then-join convenience (stats staged under `memoKey`). */
  def statsJoin(fact: DataFrame, dim: DataFrame, joinExprs: Column,
                memoKey: String): DataFrame =
    statsJoin(fact, dim, joinExprs, tableStats(dim, Some(memoKey)))
}
