package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for squared L2 distance over two
  * `array<double>` columns — the codegen'd replacement for the
  * `aggregate(zip_with(...))` chain in the PQ kernel (one fused loop, no
  * intermediate difference array; the assignment stage evaluates this
  * |corpus|·m·k times, so lambda dispatch is the dominant cost).
  *
  * Numerics are bit-identical to the HOF formulation and the DuckDB
  * oracle: sequential index-order fold of (x-y)² — IEEE doubles are
  * deterministic given the same operation order.
  */
case class L2Distance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  // locals freshName'd: a bare `int i` is a Janino redefinition error when
  // the enclosing generated function already declares one
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object L2Distance {
  /** Register as a SQL function (`l2_sq(a, b)`) on the session. */
  def register(spark: SparkSession): Unit =
    Kernels.registerOnce(spark,
      "l2_sq")( exprs => L2Distance(exprs(0), exprs(1)))
}
