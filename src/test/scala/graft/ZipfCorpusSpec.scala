package graft

/** The realistic-vocabulary scale corpus must actually have the
  * properties the round-9 verdict asked it to demonstrate: a large
  * distinct vocabulary (the banded tier's design regime), planted dup
  * structure at a fixed per-group rate, and determinism.
  */
class ZipfCorpusSpec extends SparkSpec {
  private val cdf = ZipfCorpus.zipfCdf()
  private val seed = 42L

  test("vocabulary words are pairwise distinct (injective rank -> word)") {
    val ws = (0 until 50000).map(ZipfCorpus.word(_, seed))
    assert(ws.distinct.size == ws.size)
    assert(ws.forall(w => w.length >= 4 && w.length <= 7 && w.forall(c => c >= 'a' && c <= 'z')))
  }

  test("docs are a pure function of (seed, id); dup members are planted as designed") {
    val d0 = ZipfCorpus.doc(20L, seed, cdf) // group 2, member 0
    val d1 = ZipfCorpus.doc(21L, seed, cdf)
    val d8 = ZipfCorpus.doc(28L, seed, cdf) // containment dup of d0
    val d9 = ZipfCorpus.doc(29L, seed, cdf) // token-edit near-dup of d1
    assert(ZipfCorpus.doc(20L, seed, cdf) == d0, "deterministic")
    // member 8: token-prefix of member 0 at 84-95% length, same lang/source
    val t0 = d0.text.split(" "); val t8 = d8.text.split(" ")
    assert(t8.sameElements(t0.take(t8.length)))
    assert(t8.length >= (t0.length * 0.84).toInt - 1 && t8.length < t0.length)
    assert(d8.lang == d0.lang && d8.source == d0.source)
    // member 9: same length as member 1, ~4% token edits
    val t1 = d1.text.split(" "); val t9 = d9.text.split(" ")
    assert(t9.length == t1.length)
    val edits = t1.zip(t9).count { case (a, b) => a != b }
    assert(edits >= 0 && edits <= math.max(3, t1.length / 5))
    assert(d9.lang == d1.lang)
    // a different seed moves the content
    assert(ZipfCorpus.doc(20L, 7L, cdf) != d0)
  }

  test("realistic vocabulary: distinct words grow far past the ScaleData corpus's 31") {
    val distinct = (0L until 2000L).flatMap(id =>
      ZipfCorpus.doc(id, seed, cdf).text.split(" ")).distinct.size
    assert(distinct > 20000, s"expected a Zipf tail, got $distinct distinct words")
  }

  test("the containment density probe reads this corpus as the banded regime") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = s"/tmp/graft_zipf_spec_${System.nanoTime()}"
    (0L until 1500L).map { id =>
      val d = ZipfCorpus.doc(id, seed, cdf)
      (d.docId, d.text, d.lang, d.source, d.text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // ngramContainmentAuto must select the banded tier AND surface the
    // planted pairs (member 8 is contained in member 0 of each group)
    val out = operators.DedupOps.ngramContainmentAuto(spark, dir)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 150L).map(g => (g * 10, g * 10 + 8))
    val hit = planted.count { case (a, b) => out.contains((a, b)) || out.contains((b, a)) }
    assert(hit >= planted.size * 9 / 10,
      s"planted containment pairs must surface (got $hit of ${planted.size})")
    spark.catalog.clearCache()
  }
}
