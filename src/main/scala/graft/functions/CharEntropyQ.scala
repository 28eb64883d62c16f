package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the quantized entropy numerator
  * Σ round(cᵢ·ln(cᵢ)·10⁶) over the byte histogram of a NORMALIZED string
  * (post-`normText`: only `[a-z0-9 ]`, so bytes == characters), as one
  * histogram pass + ≤128 log terms. Registered as `char_entropy_q(s)`.
  *
  * Replaces the HOF formulation (`transform(array_distinct(chars), ch ->
  * size(filter(chars, x -> x = ch)))`), which materializes a per-character
  * string array and walks it |distinct| times through interpreted lambdas —
  * measured ~4 s for the sf0.1 scan where this kernel is a single unboxed
  * byte loop inside whole-stage codegen.
  *
  * Parity: per-term rounding uses the same BigDecimal HALF_UP path as
  * Spark SQL's `round()` (via `Double.toString`, matching
  * `BigDecimal.valueOf`), and ln is `Math.log` — exactly what the HOF
  * version evaluated, so the DuckDB twin stays hash-green unchanged.
  */
case class CharEntropyQ(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "char_entropy_q"

  override def nullSafeEval(a: Any): Any =
    CharEntropyQ.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.CharEntropyQ.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropyQ {
  /** Shared by interpreted eval and codegen (one static call — the loop
    * is small enough that JIT inlines it; no Janino-side code to keep in
    * sync with the interpreter). Named `compute`, NOT `eval`: a companion
    * method whose name collides with any member of the case class (here
    * `Expression.eval`) gets no static forwarder on the class file, so
    * Janino would resolve `CharEntropyQ.eval(...)` to the instance method
    * and the generated code would fail to compile — silently falling the
    * whole stage back to interpreted eval.
    */
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val cnt = new Array[Int](128)
    var i = 0
    while (i < bytes.length) {
      cnt(bytes(i) & 0x7f) += 1
      i += 1
    }
    var out = 0L
    var c = 0
    while (c < 128) {
      val n = cnt(c)
      if (n > 0)
        out += java.math.BigDecimal.valueOf(n * Math.log(n) * 1000000.0)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      c += 1
    }
    out
  }

  def register(spark: SparkSession): Unit =
    Kernels.registerOnce(spark,
      "char_entropy_q")( exprs => CharEntropyQ(exprs.head))
}
