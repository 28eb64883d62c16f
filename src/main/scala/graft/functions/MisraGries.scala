package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitter summary as a typed `Aggregator` — the
  * bounded-state twin of an exact gram count (Misra & Gries 1982; merge
  * rule from Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Each map task maintains at most `capacity` counters regardless of
  * input size — the property that matters at 100 TB, where an exact
  * global gram count keeps |vocabulary| groups alive through the
  * shuffle while this summary ships `capacity` rows per task, total.
  *
  * Guarantees (N = stream length, C = capacity):
  *   - every item with true count > N/(C+1) is present in the summary;
  *   - estimates UNDERcount: true - N/(C+1) <= est <= true;
  *   - with C >= |distinct items| no decrement ever fires and the
  *     summary is exact — which is what gives the sketch query a
  *     bit-exact DuckDB oracle on testdata.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    b.get(item) match {
      case Some(n) => b.updated(item, n + 1)
      case None if b.size < capacity => b.updated(item, 1L)
      // full and item absent: decrement every counter, drop zeros (the
      // arriving item is absorbed by the decrement)
      case None => b.collect { case (k, v) if v > 1 => k -> (v - 1) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = (a.keySet ++ b.keySet).iterator
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    if (sum.size <= capacity) sum
    else {
      // subtract the (C+1)-th largest count from everything, drop <= 0
      val d = sum.valuesIterator.toSeq.sorted(Ordering[Long].reverse)(capacity)
      sum.collect { case (k, v) if v > d => k -> (v - d) }
    }
  }

  override def finish(b: Map[String, Long]): Seq[(String, Long)] =
    b.toSeq.sortBy { case (k, v) => (-v, k) }

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}
