package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Session registration for the native Catalyst kernels.
  *
  * Operators call `X.register(spark)` defensively on every invocation so a
  * bare session works without [[graft.GraftExtensions]]; registering via
  * `createOrReplaceTempFunction` unconditionally made every such call log
  * a `SimpleFunctionRegistry` replaced-a-registered-function WARN — 41
  * call sites × 174 queries of stderr spam that ate the round artifacts'
  * stdout tail budget. Registration is idempotent per (session, name):
  * the builder for a given name never changes, so replace-if-present buys
  * nothing.
  */
object Kernels {
  def registerOnce(spark: SparkSession, name: String)
                  (builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "built-in")
  }
}
