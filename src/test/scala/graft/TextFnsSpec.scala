package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns._

/** Short/empty-document edge cases for the text primitives. Spark's
  * `sequence(1, negative)` DESCENDS and `element_at(t, 0)` throws under
  * ANSI mode, so the shingle/gram builders guard the bound — matching the
  * DuckDB oracle's empty `range()` semantics. Real corpora contain short
  * docs even though the generated testdata doesn't.
  */
class TextFnsSpec extends SparkSpec {

  test("shingles and char-grams are empty (not errors) for docs below the n-gram size") {
    val df = spark.createDataFrame(Seq(
      (1, ""),                     // empty text → tokens [""] (size 1)
      (2, "ab"),                   // 1 token, 2 chars
      (3, "one two"),              // 2 tokens — below shingle width
      (4, "one two three four")    // 2 shingles
    )).toDF("id", "text")
      .withColumn("norm", normText(col("text")))
      .withColumn("t", tokens(col("text")))
      .withColumn("sh", expr(shingles3Sql("t")))
      .withColumn("gr", expr(charGramsSql("norm", 4)))
      .withColumn("hs", expr(hashArraySql("sh")))
      .withColumn("m0", expr(minhashSql("hs", 0)))
    val rows = df.select(col("id"), size(col("sh")).as("nsh"),
      size(col("gr")).as("ngr"), col("m0")).collect()
      .map(r => r.getInt(0) -> (r.getInt(1), r.getInt(2), Option(r.get(3)))).toMap

    assert(rows(1) == ((0, 0, None)))
    assert(rows(2) == ((0, 0, None)))            // "ab": 2 chars < 4 → no grams
    assert(rows(3)._1 == 0)                      // 2 tokens < 3 → no shingles
    assert(rows(3)._2 == 4)                      // "one two" = 7 chars → 4 grams
    assert(rows(4)._1 == 2 && rows(4)._3.isDefined)
  }
}
