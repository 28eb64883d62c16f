package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational operator suite — the standard surface SURVEY.md §2.3 marks as
  * the extension path beyond the reference (aggregations, joins, windows,
  * sorts, set ops). All queries are `DataFrame` combinators: Catalyst gets a
  * fully declarative plan (predicate pushdown, column pruning, partial
  * aggregation, AQE join re-planning are automatic).
  *
  * Scale notes (100 TB design):
  *   - Aggregations use `groupBy().agg` → hash aggregate with map-side
  *     partial aggregation; shuffle volume is |groups|, not |rows|.
  *   - Dimension tables (region/nation/supplier/customer/part at TPC-H
  *     proportions) are broadcast explicitly so fact-table joins never
  *     shuffle the lineitem side.
  *   - Floating-point aggregates are rounded at the *end* of the plan (the
  *     oracle compares hashed values; rounding also keeps results stable
  *     across partial-agg orderings).
  */
object Relational {

  /** Revenue expression used by several queries. */
  private def revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** q1: pricing-summary aggregation over lineitem (TPC-H Q1 shape).
    * Map-side partial agg → 6-group shuffle → final agg. At 100 TB the
    * shuffle carries only |R|x|S| group rows per map task.
    */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(revenue), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 6) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin
}
