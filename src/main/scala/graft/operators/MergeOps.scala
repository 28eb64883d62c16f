package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** MERGE / upsert — the batch CDC-apply surface a training-data pipeline
  * needs to maintain incrementally refreshed tables (document corpora,
  * label stores, metadata dims) without a table-format dependency. This is
  * the QUERY-PLAN form of `MERGE INTO ... WHEN MATCHED UPDATE / WHEN NOT
  * MATCHED INSERT`: file-level transactionality (Delta/Iceberg style) is a
  * storage concern; `FileIO.compact` handles the rewrite side.
  *
  * Scale notes (100 TB):
  *   - `upsert` is ONE full-outer shuffle join on the key — both sides
  *     hash-partition once. When the updates side is small (the common
  *     CDC case: a day's changes vs years of base), AQE converts it to a
  *     broadcast and the base never shuffles at all.
  *   - Row-level (not column-level) precedence: the update row wins
  *     wholesale when its key is present. Column-level patching would
  *     require nullability sentinels; callers who need it can project
  *     before calling.
  *   - `applyChangelog` collapses a multi-change log to latest-per-key
  *     FIRST (map-side partial via max_by), so the join never sees more
  *     than one row per key — the log can be arbitrarily long.
  */
object MergeOps {

  /** Latest-wins upsert of `updates` onto `base` by `keys`. Update rows are
    * complete rows (same schema as base); deletes are not modeled here —
    * see `applyChangelog` for op-coded logs with deletes. A null key
    * cannot address a row (SQL equality never matches it), so null-key
    * update rows are dropped up front — otherwise they would survive
    * the full outer join unmatched and surface as all-null rows.
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = base.columns.toSeq
    val cond = keys.map(k => col(s"b.$k") === col(s"u.$k")).reduce(_ && _)
    val hasUpdate = col(s"u.${keys.head}").isNotNull
    val upd = updates.filter(keys.map(col(_).isNotNull).reduce(_ && _))
    base.as("b").join(upd.as("u"), cond, "full_outer")
      .select(cols.map(c =>
        when(hasUpdate, col(s"u.$c")).otherwise(col(s"b.$c")).as(c)): _*)
  }

  /** Apply an op-coded changelog (op ∈ upsert|delete, seq = change order):
    * keep only the latest change per key (max seq), then full-outer join —
    * latest upsert wins, latest delete drops the row. `seq` must be
    * unique per key (a log offset / LSN is): ties would make max_by's
    * pick nondeterministic. Null-key log rows are dropped (see upsert).
    */
  def applyChangelog(base: DataFrame, log: DataFrame, keys: Seq[String],
                     opCol: String, seqCol: String): DataFrame = {
    val cols = base.columns.toSeq
    val latest = log.filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(keys.map(col): _*)
      .agg(max_by(struct((cols.filterNot(keys.contains) :+ opCol).map(col): _*),
        col(seqCol)).as("__c"))
      .select(keys.map(col) ++ cols.filterNot(keys.contains)
        .map(c => col(s"__c.$c").as(c)) :+ col(s"__c.$opCol").as(opCol): _*)
    val cond = keys.map(k => col(s"b.$k") === col(s"u.$k")).reduce(_ && _)
    val hasChange = col(s"u.${keys.head}").isNotNull
    base.as("b").join(latest.as("u"), cond, "full_outer")
      .filter(!hasChange || col(s"u.$opCol") =!= lit("delete"))
      .select(cols.map(c =>
        when(hasChange, col(s"u.$c")).otherwise(col(s"b.$c")).as(c)): _*)
  }

  /** q26: upsert applied to `orders` with a deterministic change set —
    * every 97th key restated (status R, +10% price), every 101st key
    * inserted as new (key offset past the domain, status N). Timestamps
    * exit on the integer epoch-ms axis (cross-engine canonical form).
    */
  def q26Upsert(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    val upd = ord.filter(col("o_orderkey") % 97 === 0)
      .withColumn("o_orderstatus", lit("R"))
      // +10% on the integer cent grid. o_totalprice is a 2-decimal value in
      // a double, so round(p*100) recovers exact cents; ×11 then half-up to
      // the dime keeps the tie-break (…x.5 cents, i.e. cents ending in 5)
      // in integer space where both engines agree — round(p*1.1, 2) parked
      // those ties on engine-dependent double formatting (one tie row
      // diverged at sf0.1; none existed at sf0.01).
      .withColumn("o_totalprice", expr(
        "floor((CAST(round(o_totalprice * 100) AS BIGINT) * 11 + 5) / 10.0) / 100.0"))
    val ins = ord.filter(col("o_orderkey") % 101 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      .withColumn("o_orderstatus", lit("N"))
    upsert(ord, upd.unionByName(ins), Seq("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        // o_orderdate reads as TIMESTAMP_NTZ; the session tz is pinned UTC,
        // so the cast yields the same instant DuckDB's naive epoch_ms sees
        unix_millis(col("o_orderdate").cast("timestamp")).as("odate_ms"),
        col("o_orderpriority"))
  }

  /** Slowly-changing-dimension TYPE 2 build from an event changelog: the
    * third member of the CDC-apply family (q26 `upsert` = overwrite
    * history, q32 `latest` = keep only the newest state, scd2 = keep ALL
    * states with validity intervals). Consecutive duplicate states
    * collapse (a change row is emitted only when the tracked attribute
    * actually changes); each surviving state carries
    * `[valid_from, valid_to)` on the integer epoch-µs axis, a per-key
    * `version` counter, and `is_current` on the open-ended row.
    *
    * Scale shape: both windows share one `(key)` hash partitioning and
    * one `(ts, tie)` sort order, so the whole build is ONE exchange of
    * slim (key, attr, ts, tie) rows — history length per key is bounded
    * by that key's own change count, never corpus size. This is the plan
    * a 100 TB changelog wants: no self-join of the log against itself
    * (the naive SQL formulation), no global sort.
    */
  def scd2(log: DataFrame, key: String, attr: String,
           tsCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(key).orderBy(col(tsCol), col(tieCol))
    log.select(col(key), col(attr), col(tsCol), col(tieCol))
      .withColumn("__prev", lag(col(attr), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attr))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .select(col(key), col(attr), col("valid_from"), col("valid_to"),
        col("version"), col("valid_to").isNull.as("is_current"))
  }

  /** ev_scd2: type-2 history of each user's event_type over the events
    * changelog, epoch-µs validity axis (ts is TIMESTAMP(NANOS), read as
    * long nanos; `div 1000` is exact — the generator emits µs values).
    */
  def evScd2(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000").as("us"), col("event_id"))
    scd2(ev, "user_id", "event_type", "us", "event_id")
      .select(col("user_id"), col("event_type"),
        col("valid_from").as("valid_from_us"),
        col("valid_to").as("valid_to_us"),
        col("version"), col("is_current"))
  }

  val evScd2Sql: String =
    """WITH o AS (
      |  SELECT user_id, event_type, us, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
      |  FROM (SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events)),
      |c AS (
      |  SELECT user_id, event_type, us, event_id FROM o
      |  WHERE prev IS NULL OR prev != event_type)
      |SELECT user_id, event_type, us AS valid_from_us,
      |  lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to_us,
      |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT) AS version,
      |  (lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL) AS is_current
      |FROM c""".stripMargin

  val q26UpsertSql: String =
    """WITH u AS (
      |  SELECT o_orderkey, o_custkey, 'R' AS o_orderstatus,
      |    floor((CAST(round(o_totalprice * 100) AS BIGINT) * 11 + 5) / 10.0) / 100.0
      |      AS o_totalprice, o_orderdate,
      |    o_orderpriority
      |  FROM orders WHERE o_orderkey % 97 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_custkey, 'N', o_totalprice,
      |    o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 101 = 0)
      |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |  epoch_ms(o_orderdate) AS odate_ms, o_orderpriority
      |FROM (
      |  SELECT * FROM u
      |  UNION ALL
      |  SELECT b.* FROM orders b
      |  WHERE NOT EXISTS (SELECT 1 FROM u WHERE u.o_orderkey = b.o_orderkey))""".stripMargin
}
