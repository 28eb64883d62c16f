package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Temporal join operators. The as-of join (each left row matched to the
  * most recent right row at-or-before its time, per key) is implemented as
  * union → single hash-shuffle on the key → one sort → running
  * `last(..., ignoreNulls)` — O(n log n) per partition with ONE exchange,
  * instead of the O(n²) inequality join a naive formulation produces.
  * This is the plan shape that survives 100 TB: no broadcast of an
  * unbounded side, no range-join explosion, and AQE handles key skew.
  *
  * (DuckDB expresses the same operator as `ASOF JOIN`; the oracle uses the
  * identical window formulation to pin tie semantics exactly.)
  */
object Temporal {

  /** Generic as-of join.
    *
    * @param left       left rows (all kept)
    * @param right      right rows (matched backward in time)
    * @param keys       equi-join keys
    * @param tsCol      event-time column name (same name both sides)
    * @param idCol      unique tiebreak column name (same both sides)
    * @param rightVals  right columns to carry (emitted as `asof_<name>`)
    *
    * At equal timestamps the right row is considered visible to the left
    * row (right sorts first; ties inside a side break by `idCol`).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, idCol: String,
               rightVals: Seq[String]): DataFrame = {
    val keep = keys ++ Seq(tsCol, idCol)
    val l = left.select(keep.map(col) ++ Seq(lit(0).as("__is_right")) ++
      rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(s"__rv_$c")): _*)
    val r = right.select(keep.map(col) ++ Seq(lit(1).as("__is_right")) ++
      rightVals.map(c => col(c).as(s"__rv_$c")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__is_right").desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l.unionByName(r)
      .select((keep.map(col) :+ col("__is_right")) ++
        rightVals.map(c => last(col(s"__rv_$c"), ignoreNulls = true).over(w)
          .as(s"asof_$c")): _*)
    carried.filter(col("__is_right") === 0).drop("__is_right")
  }

  /** ev_asof: each `error` event joined to the user's most recent
    * `purchase` at-or-before it.
    */
  def evAsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .withColumn("ts_us", expr("ts div 1000"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts_us"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("value").as("purch_value"))
    asofJoin(errors, purchases, Seq("user_id"), "ts_us", "event_id",
      Seq("purch_value"))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("asof_purch_value"))
  }

  val evAsofJoinSql: String =
    """SELECT event_id, user_id, ts_us, asof_purch_value FROM (
      |  SELECT event_id, user_id, ts_us, is_right,
      |    last_value(rv IGNORE NULLS) OVER (
      |      PARTITION BY user_id
      |      ORDER BY ts_us ASC, is_right DESC, event_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_purch_value
      |  FROM (
      |    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_right,
      |      CASE WHEN event_type = 'purchase' THEN value END AS rv
      |    FROM events WHERE event_type IN ('error', 'purchase')))
      |WHERE is_right = 0""".stripMargin
}
