package graft.serde

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON serde against an explicit schema — the Spark analogue of the
  * reference's Jackson serde pair (SURVEY.md §1.4; reference
  * `JsonSerializer.java` / `JsonDeserializer.java`).
  *
  * The reference deserializer is fail-fast (malformed JSON throws).
  * Spark's `from_json` default is PERMISSIVE (malformed → null row) —
  * both modes are exposed; FAILFAST is the parity default for pipelines,
  * PERMISSIVE the production default at 100 TB (a single corrupt record
  * must not kill a 1000-executor job; nulls are filtered + counted
  * instead).
  */
object JsonCodec {

  sealed trait Mode { def sparkMode: String }
  case object FailFast extends Mode { val sparkMode = "FAILFAST" }
  case object Permissive extends Mode { val sparkMode = "PERMISSIVE" }

  /** Parse a JSON string/binary column to a struct. Null in → null out
    * (matching the reference's null-passthrough, `JsonDeserializer.java:27-28`).
    */
  def decode(c: Column, schema: StructType, mode: Mode = FailFast): Column =
    from_json(c.cast("string"), schema, Map("mode" -> mode.sparkMode))

  /** Serialize a struct column to a JSON string (binary for Kafka sinks).
    * Null in → null out (`JsonSerializer.java:23-24`).
    */
  def encodeJson(c: Column): Column = to_json(c)
  def encodeJsonBinary(c: Column): Column = to_json(c).cast("binary")

  /** Decode a Kafka-shaped frame (key/value/timestamp) into the engine's
    * canonical columns: `key: string`, `event: struct`, `event_time_us:
    * long`.
    */
  def decodeKafkaFrame(df: DataFrame, schema: StructType,
                       mode: Mode = FailFast): DataFrame =
    df.select(
      col("key").cast("string").as("key"),
      decode(col("value"), schema, mode).as("event"),
      unix_micros(col("timestamp")).as("event_time_us"))

  /** Encode back to a Kafka-shaped frame. */
  def encodeKafkaFrame(df: DataFrame): DataFrame =
    df.select(
      col("key").cast("binary").as("key"),
      encodeJsonBinary(col("event")).as("value"))
}
