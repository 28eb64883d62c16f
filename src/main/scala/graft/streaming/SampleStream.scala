package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic streaming sampler — the streaming twin of the batch
  * hash-sampling discipline (`SampleOps`): keep the k items with the
  * SMALLEST deterministic hash ("bottom-k"). Over any prefix of the
  * stream this is exactly a uniform-without-replacement sample of size
  * k (every item's rank is a fixed pseudorandom draw), it is mergeable
  * (union → re-trim), and unlike Algorithm-R reservoirs it is
  * REPRODUCIBLE: the same input set yields the same sample regardless
  * of arrival order or batch boundaries — the property that makes
  * batch/stream twins testable and backfills byte-identical.
  *
  * State is O(k) in the state store, merged per micro-batch like the
  * Misra-Gries summary. Run with Complete output mode.
  */
object SampleStream {

  /** Deterministic across JVMs/executors: 64-bit FNV-1a with a
    * murmur-style avalanche finalizer — raw FNV's trailing characters
    * barely reach the high bits (multiply only carries upward), which
    * visibly skews rank order on sequential ids. */
  def rank(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  class BottomK(k: Int)
      extends Aggregator[String, Seq[(Long, String)], Seq[String]] {
    override def zero: Seq[(Long, String)] = Vector.empty

    // sample of the DISTINCT item set: duplicates share a rank and must
    // not occupy two sample slots
    private def trim(b: Seq[(Long, String)]): Seq[(Long, String)] =
      if (b.length <= k) b.distinct else b.distinct.sorted.take(k)

    override def reduce(b: Seq[(Long, String)], a: String): Seq[(Long, String)] = {
      val withNew = b :+ ((rank(a), a))
      // amortize the sort: trim when the buffer doubles
      if (withNew.length > 2 * k) trim(withNew) else withNew
    }

    override def merge(a: Seq[(Long, String)], b: Seq[(Long, String)]): Seq[(Long, String)] =
      trim(a ++ b)

    override def finish(b: Seq[(Long, String)]): Seq[String] =
      b.distinct.sorted.take(k).map(_._2)

    override def bufferEncoder: Encoder[Seq[(Long, String)]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
  }

  /** Uniform k-sample over a stream of items (Complete output mode). */
  def bottomK(items: Dataset[String], k: Int): DataFrame =
    items.select(new BottomK(k).toColumn.name("sample")).toDF()

  /** Weighted rank (Efraimidis–Spirakis A-ES with the uniform draw
    * derandomized to the item's hash): keep the k smallest
    * `-ln(u)/w` — inclusion probability proportional to weight, same
    * mergeability and reproducibility as the uniform form. */
  def weightedRank(s: String, w: Double): Double = {
    require(w > 0, s"weight must be positive, got $w for '$s'")
    // map the 64-bit rank into (0, 1) — strictly inside, so ln is finite
    val u = (rank(s) >>> 11).toDouble / (1L << 53).toDouble + java.lang.Double.MIN_NORMAL
    -math.log(u) / w
  }

  class BottomKWeighted(k: Int)
      extends Aggregator[(String, Double), Seq[(Double, String)], Seq[String]] {
    override def zero: Seq[(Double, String)] = Vector.empty
    private def trim(b: Seq[(Double, String)]): Seq[(Double, String)] =
      if (b.length <= k) b.distinct else b.distinct.sorted.take(k)
    override def reduce(b: Seq[(Double, String)], a: (String, Double)): Seq[(Double, String)] = {
      val withNew = b :+ ((weightedRank(a._1, a._2), a._1))
      if (withNew.length > 2 * k) trim(withNew) else withNew
    }
    override def merge(a: Seq[(Double, String)], b: Seq[(Double, String)]): Seq[(Double, String)] =
      trim(a ++ b)
    override def finish(b: Seq[(Double, String)]): Seq[String] =
      b.distinct.sorted.take(k).map(_._2)
    override def bufferEncoder: Encoder[Seq[(Double, String)]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
  }

  /** Weight-proportional k-sample (items paired with positive weights). */
  def bottomKWeighted(items: Dataset[(String, Double)], k: Int): DataFrame =
    items.select(new BottomKWeighted(k).toColumn.name("sample")).toDF()

  /** Batch twin of the weighted sampler. */
  def bottomKWeightedBatch(items: Seq[(String, Double)], k: Int): Seq[String] =
    items.distinct.map { case (s, w) => (weightedRank(s, w), s) }
      .sorted.take(k).map(_._2)

  /** The batch twin over a local collection — for tests and backfills. */
  def bottomKBatch(items: Seq[String], k: Int): Seq[String] =
    items.distinct.map(s => (rank(s), s)).sorted.take(k).map(_._2)
}
