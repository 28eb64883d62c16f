package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.FileIO
import graft.operators.{DedupOps, SampleOps, TextOps}

/** End-to-end training-data pipeline over the batch operators: near-dup
  * removal → quality filter → stratified sample → partitioned write.
  * This is the composition a user of the library actually runs; the spec
  * pins that the stages compose (ids flow through), the output directory
  * is lang-partitioned, and reads prune on the partition column.
  */
class CorpusPipelineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("dedup -> quality -> sample -> partitioned write composes end-to-end") {
    val corpus = DedupOps.dedupCorpus(spark, sf) // (doc_id, lang, n_chars)
    val quality = TextOps.docQuality(spark, sf)
      .filter(col("n_tokens") >= 5 && col("uniq_ratio") > 0.1)
      .select(col("doc_id"))
    val sampled = SampleOps.docSampleStrat(spark, sf).select(col("doc_id"))
    val kept = corpus
      .join(quality, Seq("doc_id"), "left_semi")
      .join(sampled, Seq("doc_id"), "left_semi")

    val total = Tables.documents(spark, sf).count()
    val n = kept.count()
    assert(n > 0 && n < total, s"pipeline must filter: $n of $total")

    val out = Files.createTempDirectory("graft_pipe").toString + "/corpus"
    FileIO.writeParquet(kept, out, partitionBy = Seq("lang"))
    val dirs = new java.io.File(out).listFiles.filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("lang=")))

    val back = FileIO.readParquet(spark, out).filter(col("lang") === "en")
    val scans = back.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.head.partitionFilters.nonEmpty, "lang filter must prune partitions")
    assert(back.count() == kept.filter(col("lang") === "en").count())
  }

  test("sequence packing: offsets are contiguous per lang and chunks cover the tokens") {
    val packed = SampleOps.docPack(spark, sf).collect()
      .groupBy(_.getString(1))
    packed.foreach { case (lang, rows) =>
      val sorted = rows.sortBy(_.getLong(0))
      // concat-and-chunk: each doc starts exactly where the previous ended
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(3) + a.getLong(2) == b.getLong(3),
            s"$lang: doc ${b.getLong(0)} start != prev end")
        case _ =>
      }
      val total = sorted.map(_.getLong(2)).sum
      val lastChunk = sorted.map(r => r.getLong(4) + r.getLong(5) - 1).max
      assert(lastChunk == (total - 1) / SampleOps.Capacity,
        s"$lang: chunk count must cover exactly ceil(total/C)")
      // a doc spanning k chunks has k-1 internal boundaries inside it
      sorted.foreach { r =>
        val span = (r.getLong(3) + r.getLong(2) - 1) / SampleOps.Capacity -
          r.getLong(3) / SampleOps.Capacity
        if (r.getLong(2) > 0)
          assert(r.getLong(5) == span + 1, s"$lang doc ${r.getLong(0)} n_chunks")
      }
    }
  }

  test("line dedup keeps only the corpus-wide first occurrence of a chunk") {
    import spark.implicits._
    // chunkWords = 2: doc 1 = [a b][c d], doc 2 = [a b][e f], doc 3 = [c d]
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b e f"),
      (3L, "c d")
    ).toDF("doc_id", "text")
    val out = DedupOps.lineDedup(docs, chunkWords = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 2 && out(1L).getLong(2) == 2)
    assert(out(1L).getString(3) == "a b c d")
    // doc 2 loses "a b" (doc 1 owns it), keeps "e f"
    assert(out(2L).getLong(2) == 1 && out(2L).getString(3) == "e f")
    // doc 3 loses its only chunk -> empty text survives with n_kept = 0
    assert(out(3L).getLong(2) == 0 && out(3L).getString(3) == "")
  }

  test("line dedup keeps the earliest position when a chunk repeats within a doc") {
    import spark.implicits._
    val docs = Seq((1L, "x y x y z z")).toDF("doc_id", "text")
    val out = DedupOps.lineDedup(docs, chunkWords = 2).collect().head
    // chunks: [x y][x y][z z] -> first [x y] kept, second dropped
    assert(out.getLong(1) == 3 && out.getLong(2) == 2)
    assert(out.getString(3) == "x y z z")
  }

  test("observe() stage counters report in-job without extra scans") {
    val sf = "/root/testdata/sf0.001"
    val (df, obs) = graft.operators.CorpusPipeline.corpusPreparedObserved(spark, sf)
    val outRows = df.count()
    val canonical = obs("canonical").get("rows").asInstanceOf[Long]
    val quality = obs("quality").get("rows").asInstanceOf[Long]
    val prepared = obs("prepared").get("rows").asInstanceOf[Long]
    assert(prepared == outRows, "observed final count must match the action")
    assert(canonical > 0 && quality > 0)
    assert(prepared <= canonical && prepared <= quality,
      "joins can only narrow the stage outputs")
    assert(obs("prepared").get("avg_tokens").asInstanceOf[Double] >= 20.0,
      "quality gate floor must hold in the observed metric")
  }

  test("corpus_release: manifest invariants — coverage, capacity, leakage") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val rel = graft.operators.CorpusPipeline.corpusRelease(spark, sf).cache()
    try {
      // exactly the survivor set, each doc once
      val surv = graft.operators.CorpusPipeline.corpusPreparedBest(spark, sf)
        .select(col("doc_id"))
      assert(rel.select(col("doc_id")).exceptAll(surv).isEmpty &&
        surv.exceptAll(rel.select(col("doc_id"))).isEmpty,
        "release manifest must cover the survivor set exactly once")
      // packing capacity per (split, shard, bin) for packable docs
      val cap = graft.operators.SampleOps.Capacity
      val over = rel.groupBy(col("split"), col("shard"), col("bin"))
        .agg(sum(col("n_tok")).as("fill"), max(col("n_tok")).as("mx"))
        .filter(col("mx") <= cap && col("fill") > cap)
      assert(over.isEmpty, "a released bin exceeds capacity")
      // leakage guard survives the composition: released near-dup cluster
      // members still share a split
      val labels = graft.operators.DedupOps.dedupClusters(spark, sf)
      val bad = rel.join(labels, Seq("doc_id"))
        .groupBy(col("cluster_id"))
        .agg(countDistinct(col("split")).as("k")).filter(col("k") > 1)
      assert(bad.isEmpty, "released near-dups straddle the train/eval split")
    } finally { rel.unpersist(); CacheScope.release() }
  }
}
