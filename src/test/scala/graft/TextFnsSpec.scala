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

  test("compressionRatio: repetitive text compresses far below varied text") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "spam " * 400),                                   // pure repetition
      (2L, (0 until 400).map(i => s"w${i * 2654435761L % 9973}").mkString(" ")),
      (3L, "")                                               // empty: guarded division
    ).toDS()
    val rows = graft.operators.TextOps.compressionRatio(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows(1)._2 < 0.05, s"repetition must crush: ${rows(1)}")
    assert(rows(2)._2 > 0.3, s"varied text must not: ${rows(2)}")
    assert(rows(2)._2 > rows(1)._2 * 5)
    assert(rows(3)._1 == 0L)
  }
}
