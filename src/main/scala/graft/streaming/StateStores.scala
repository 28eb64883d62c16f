package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store provider selection for the `transformWithState` operators.
  *
  * Spark resolves `spark.sql.streaming.stateStore.providerClass` from the
  * SESSION conf when a streaming query starts — there is no per-query
  * writeStream option for it — and `transformWithState` requires the
  * RocksDB provider. Rather than each operator silently flipping the
  * session conf as a hidden side effect of building its Dataset (which
  * switches every OTHER streaming query in the session too), the caller
  * opts in explicitly here, once, where the blast radius is visible:
  * apps/benches call it at session setup; specs call it inside their
  * save/restore wrapper.
  */
object StateStores {
  val RocksDB: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Session-wide, deliberate: every streaming query started after this
    * call uses RocksDB state stores until the conf is changed back.
    */
  def useRocksDB(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDB)
}
