package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Perceptual-hash near-dup: the pigeonhole completeness guarantee (≤ 7
  * differing bits cannot dirty all 8 bands → banded recall over uncapped
  * buckets is EXACTLY brute force), precision (exact confirm), and the
  * perceptual property itself — a small payload edit moves the hash only
  * a few bits, so (original, edited) pairs are found.
  */
class MmPhashSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("uncapped banding == brute force at hamming <= 7 (pigeonhole); capped is a subset") {
    val docs = Tables.documents(spark, sf)
    val sig = Multimodal.mmPhash(spark, sf)
    val a = sig.select(col("doc_id").as("a_id"), col("phash").as("pa"))
    val b = sig.select(col("doc_id").as("b_id"), col("phash").as("pb"))
    val brute = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("hamming", expr("bit_count(pa ^ pb)"))
      .filter(col("hamming") <= 7)
      .select("a_id", "b_id", "hamming")
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val bruteSet = pairs(brute)
    val uncapped = pairs(Multimodal.mmPhashNeardupOf(docs,
      maxBucket = Int.MaxValue, maxHamming = 7))
    assert(uncapped == bruteSet,
      s"pigeonhole violated: banded=${uncapped.size} brute=${bruteSet.size}")
    val capped = pairs(Multimodal.mmPhashNeardupOf(docs, maxBucket = 64, maxHamming = 7))
    assert(capped.subsetOf(bruteSet), "capped banding emitted a false pair")
    info(s"brute=${bruteSet.size}, uncapped=${uncapped.size}, capped(64)=${capped.size}")
  }

  test("small payload edits land within hamming 7 of the original and are found") {
    val s = spark
    import s.implicits._
    val orig = Tables.documents(spark, sf)
      .filter(length(col("text")) >= 400)
      .orderBy("doc_id").limit(40)
      .select(col("doc_id"), col("text"))
    val rows = orig.collect().map(r => (r.getLong(0), r.getString(1)))
    // deterministic small edit mid-payload: swap one word's chars; the
    // slice-average cells perturb only around the edit point
    val edited = rows.map { case (id, t) =>
      val mid = t.length / 2
      (id + 1000000L, t.substring(0, mid) + "qzx" + t.substring(mid + 3))
    }
    val union = (rows ++ edited).toSeq.toDF("doc_id", "text")
    val found = Multimodal.mmPhashNeardupOf(union,
        maxBucket = Int.MaxValue, maxHamming = 7)
      .filter(col("b_id") === col("a_id") + 1000000L)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    // the perceptual property: a 3-char mid-doc edit should keep most
    // pairs within the threshold (empirically all 40 on this corpus; a
    // generous floor guards regeneration churn without flaking)
    assert(found.size >= 30,
      s"only ${found.size}/40 edited payloads found within hamming 7: $found")
    info(s"${found.size}/40 edit pairs found; hamming histogram: " +
      found.values.groupBy(identity).view.mapValues(_.size).toSeq.sorted.mkString(", "))
  }

  test("mm_phash_cluster labels are consistent with the pair graph") {
    val sfDir = sf
    val pairs = Multimodal.mmPhashNeardupOf(Tables.documents(spark, sfDir),
        maxBucket = 64, maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val labels = Multimodal.mmPhashCluster(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pairs.nonEmpty, "calibration drift: no 16-bit pairs at sf0.01")
    // every edge endpoint is labeled, endpoints agree, and each label is
    // the minimum member id of its cluster (the CC canonical-form contract)
    pairs.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"pair ($a, $b) split across clusters")
    }
    labels.groupBy(_._2).foreach { case (cid, members) =>
      assert(cid == members.keys.min, s"cluster $cid label is not the min member")
    }
    info(s"${pairs.length} edges -> ${labels.values.toSet.size} clusters over ${labels.size} docs")
  }

  test("mm_audio_features: window count from payload size, bounded stats") {
    val out = Multimodal.mmAudioFeatures(spark, sf).cache()
    try {
      val docs = Tables.documents(spark, sf)
        .select(col("doc_id"), octet_length(encode(col("text"), "UTF-8")).as("nb"))
      // n_win is exactly bytes/512 + 1 — the stub codec's contract
      val bad = out.join(docs, Seq("doc_id"))
        .filter(col("n_win") =!= expr("nb div 512 + 1"))
      assert(bad.isEmpty, "window count must follow the 512-byte chunking")
      assert(out.count() == docs.count(), "one row per payload")
      // RMS of 16-bit-centered samples lies in [0, 32768]; ZCR in [0, 1]
      assert(out.filter(col("rms") < 0 || col("rms") > 32768.0).isEmpty)
      assert(out.filter(col("zcr") < 0 || col("zcr") > 1.0).isEmpty)
      // deterministic across runs (md5-derived stub)
      val again = Multimodal.mmAudioFeatures(spark, sf)
      assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    } finally out.unpersist()
  }
}
