package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: the deterministic ±1
  * Johnson–Lindenstrauss projection of a double vector to `rpDims`
  * dimensions — sign(j,i) = ((12289+7j)·i + 101j + 13) mod P mod 2, the
  * same integer formula as the SQL/DuckDB form, folded in the same
  * ascending-i order so every partial double sum is bit-identical to the
  * HOF it replaces. Registered as `jl_project(v, rpDims)`.
  *
  * The HOF form (`transform(sequence(1,k), j -> aggregate(sequence(1,d),
  * ...))`) evaluates k·d interpreted lambdas with boxed accumulators per
  * row — measured ~4.4 s for the sf0.1 embedding scan; this kernel is a
  * k·d unboxed loop. Rounding to 6 decimals stays OUTSIDE (a k-element
  * `transform(..., x -> round(x, 6))`), so the kernel emits raw sums and
  * Spark's own round semantics keep oracle parity.
  */
case class JlProject(child: Expression, rpDims: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "jl_project"

  override def nullSafeEval(a: Any): Any =
    JlProject.eval(a.asInstanceOf[ArrayData], rpDims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.JlProject.eval($a, $rpDims);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JlProject {
  private val P = 2147483647L

  def eval(v: ArrayData, rpDims: Int): ArrayData = {
    val d = v.numElements()
    val out = new Array[Double](rpDims)
    var j = 1
    while (j <= rpDims) {
      var acc = 0.0d
      var i = 1
      while (i <= d) {
        val sign = if ((((12289L + 7L * j) * i + 101L * j + 13L) % P) % 2L == 0L) 1.0d else -1.0d
        acc += v.getDouble(i - 1) * sign
        i += 1
      }
      out(j - 1) = acc
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jl_project",
      exprs => JlProject(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue()),
      "built-in")
}
