package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * Every query receives an `sfDir` (e.g. `/root/testdata/sf0.01`) and loads
  * tables lazily from it; Catalyst pushes filters/projections down to the
  * parquet scan, so loading "the whole table" here is free — only the columns
  * and row groups a query needs are read. At cluster scale the same code path
  * reads a partitioned table from object storage; nothing here assumes local
  * disk.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Every batch operator loads its tables here before building any
    // expression, so this is the one funnel where the fused hash kernel
    // (TextFns.h32Sql -> md5_h64, r13) is guaranteed registered ahead of
    // analysis. Idempotent and ~free after the first call.
    graft.functions.Md5Head64.register(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` loads as a Long of epoch-nanos regardless of the physical
    * parquet type — the generator has shipped BOTH over time:
    *
    *   - TIMESTAMP(NANOS), which Spark 4 rejects ([PARQUET_TYPE_ILLEGAL])
    *     unless read as a nano long via `nanosAsLong`;
    *   - `timestamp[us]` (isAdjustedToUTC=false → TIMESTAMP_NTZ), which
    *     this loader converts back to the nano-long axis
    *     (`unix_micros * 1000`; sessions pin UTC, so the NTZ wall clock
    *     IS the epoch value, bit-exact with DuckDB's `epoch_us(ts)`).
    *
    * All event-time arithmetic downstream is on integer microseconds
    * (`ts_us = ts div 1000`) either way — a projection folded into the
    * scan, never a second pass.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ => df.withColumn("ts",
        org.apache.spark.sql.functions.expr("unix_micros(cast(ts AS timestamp)) * 1000"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
