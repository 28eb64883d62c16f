package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns — the codegen'd replacement for the
  * `aggregate(zip_with(...))` higher-order-function chain (one fused loop,
  * no per-element lambda dispatch, no intermediate array allocation).
  *
  * Numerics are bit-identical to the HOF formulation (and the DuckDB
  * oracle): sequential left-fold of dot/norm accumulators, then
  * `dot / (sqrt(na) * sqrt(nb))` — IEEE doubles are deterministic given
  * the same operation order.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are always array<double> (the operators cast); no ExpectsInputTypes
  // because AbstractDataType is private[sql] in Spark 4
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // locals freshName'd: a bare `int i` is a Janino redefinition error when
  // the enclosing generated function already declares one (fallback to
  // interpreted — silent, and exactly the codegen exit this kernel exists
  // to avoid)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native raw dot product over two `array<double>` columns — the MIPS
  * score ([[graft.operators.VectorOps.embMipsKnn]]). Same fused-loop /
  * sequential-fold discipline as [[CosineSimilarity]], so the value is
  * bit-identical to the oracle's `list_sum(list_transform(...))`.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Register as a SQL function (`cosine_sim(a, b)`) on the session; the
    * operators call it through `expr(...)`, keeping the public surface
    * Column-API-only.
    */
  def register(spark: SparkSession): Unit =
    Kernels.registerOnce(spark,
      "cosine_sim")( exprs => CosineSimilarity(exprs(0), exprs(1)))

  /** Register `dot_product(a, b)` (the [[DotProduct]] kernel). */
  def registerDot(spark: SparkSession): Unit =
    Kernels.registerOnce(spark,
      "dot_product")( exprs => DotProduct(exprs(0), exprs(1)))
}
