package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain

/** SQL-surface registration of Spark's native bloom-filter probe — the
  * same codegen'd `BloomFilterMightContain` Catalyst expression the
  * optimizer's own runtime-filter injection uses, exposed as
  * `bloom_might_contain(<binary bloom>, <long value>)` so operators can
  * apply a pre-built filter deterministically (InjectRuntimeFilter only
  * fires above size thresholds a test-scale plan never meets).
  *
  * The bloom argument must be a foldable binary (a literal: the
  * serialized `org.apache.spark.util.sketch.BloomFilter`); the value a
  * BIGINT. Deserialization happens once per task (lazy inside the
  * expression), the probe itself is two xxhash-style multiplications per
  * row inside whole-stage codegen.
  */
object BloomFns {
  def register(spark: SparkSession): Unit =
    Kernels.registerOnce(spark,
      "bloom_might_contain")(
      exprs => BloomFilterMightContain(exprs(0), exprs(1)))

  /** Serialize a sketch bloom filter to the hex form `x'...'` SQL binary
    * literals take.
    */
  def toHex(bf: org.apache.spark.util.sketch.BloomFilter): String = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray.map("%02x".format(_)).mkString
  }
}
