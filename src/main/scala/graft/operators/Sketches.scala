package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HyperLogLog re-expressed as a two-level DECLARATIVE aggregate — the
  * Spark-native sketch formulation.
  *
  * Spark's builtin `approx_count_distinct` is an ImperativeAggregate;
  * one in an aggregate list drops the whole HashAggregateExec (and the
  * scan feeding it) out of whole-stage codegen — measured at sf0.1 as
  * the sketch query benching SLOWER than its exact twin (the round-3
  * SCALE.md "Bench audit" caveat). Instead of hand-writing a native
  * kernel, reformulate: HLL *is* "max rank per hash bucket, then a
  * harmonic mean" — and both levels are ordinary codegen'd builtins:
  *
  *   level 1: groupBy(bucket = low p bits of xxhash64)  →  max(rank)
  *   level 2: harmonic sum of the ≤ m bucket rows       →  estimate
  *
  * Scale shape: level 1's map-side partial max bounds every partition's
  * shuffle contribution at m rows (m = 16384 ≈ 256 KB of (idx, max)
  * pairs — same order as the imperative sketch's 16 KB partials, still
  * nothing); level 2 aggregates ≤ m rows per group. Nothing imperative,
  * nothing interpreted, no Expand over the full input (the exact
  * count-distinct's scale problem).
  *
  * Determinism: the harmonic sum Σ 2^−rank is computed in FIXED-POINT —
  * each bucket contributes the long 2^(Scale−rank) via an unsigned
  * shift, so the cross-partition sum is exact integer arithmetic with
  * no float-order jitter; ranks above Scale (probability ≤ n·2⁻⁴⁶)
  * floor to 0, a < 2⁻⁴⁵ relative error. Small-range correction is
  * standard linear counting (m·ln(m/V) when the raw estimate ≤ 2.5m and
  * empty buckets remain); no large-range correction is needed with a
  * 64-bit hash.
  *
  * Accuracy: p=14 → m=16384, rsd ≈ 1.04/√m ≈ 0.81% — the same regime
  * as the builtin at rsd 0.01; AccuracySpec holds both sketch queries
  * to 2% of their exact twins.
  */
object Sketches {

  /** Precision: buckets = 2^P. */
  val P: Int = 14
  val M: Int = 1 << P
  private val Alpha = 0.7213 / (1 + 1.079 / M)
  /** Fixed-point scale of the harmonic sum (see determinism note). */
  private val Scale = 45
  /** Rank-source width: 48 bits (md5 hex chars 5–16; chars 1–4 feed the
    * bucket index, so the two draws are bit-disjoint). Max rank = 49.
    */
  private val WBits = 48

  /** Hash base — the md5 hex digest of the value's string form, the same
    * oracle-parity indirection as [[graft.functions.TextFns.h32Sql]]:
    * both engines compute identical digests, so the driver can hash-check
    * the sketch itself (r7 left q18/q21_approx as rows-only blind spots
    * solely because the old xxhash64 base had no DuckDB twin). A
    * production deployment swaps xxhash64 back in through this one
    * function — the operator structure is hash-agnostic.
    */
  private def hexDigest(value: Column): Column = md5(value.cast("string"))

  /** Bucket index: 16-bit hex prefix mod m (16384 divides 65536 — exactly
    * uniform).
    */
  def hllIdx(value: Column): Column =
    conv(substring(hexDigest(value), 1, 4), 16, 10).cast("long") % M

  /** Rank = 1 + leading zeros of the 48-bit rank source.
    * `length(bin(w))` is floor(log2 w)+1 EXACTLY (string length of the
    * binary form — codegen'd; a float log2 can land on k−ε at powers of
    * two and floor to the wrong rank).
    */
  def hllRank(value: Column): Column = {
    val w = conv(substring(hexDigest(value), 5, 12), 16, 10).cast("long")
    when(w === 0, lit(WBits + 1)).otherwise(lit(WBits + 1) - length(bin(w)))
  }

  /** Fixed-point harmonic contribution 2^(Scale−maxRank) of one bucket:
    * an unsigned right shift of 2^Scale, so rank > Scale floors to 0
    * (never a negative-shift wraparound).
    */
  def hllContribution(maxRank: Column): Column =
    call_function("shiftrightunsigned", lit(1L << Scale), maxRank)

  /** Final estimate from the level-2 aggregates: `present` = count of
    * occupied buckets, `sumContrib` = Σ contributions of occupied
    * buckets. Empty buckets contribute rank 0 → 2^Scale each.
    */
  def hllEstimate(present: Column, sumContrib: Column): Column = {
    val v = lit(M.toLong) - present
    val sumL = sumContrib + v * lit(1L << Scale)
    val raw = lit(Alpha * M.toDouble * M.toDouble * math.pow(2.0, Scale)) /
      sumL.cast("double")
    when(raw <= lit(2.5 * M) && v > 0,
      round(lit(M.toDouble) * log(lit(M.toDouble) / v.cast("double"))))
      .otherwise(round(raw))
      .cast("long")
  }

  // ——— DuckDB twin fragments: the SAME sketch, SQL-side. The level-1/2
  // aggregate structure lives in the caller's oracle SQL; these emit the
  // per-row hash pieces and the finalization so both engines share every
  // constant and every arithmetic step (the integer harmonic sum is
  // fold-order-free; the one double division and ln are identical IEEE
  // ops on identical inputs, rounded to an integer).

  def hllIdxSql(inner: String): String =
    s"(('0x' || substr(md5(CAST($inner AS VARCHAR)), 1, 4))::BIGINT % $M)"

  def hllRankSql(inner: String): String = {
    val w = s"('0x' || substr(md5(CAST($inner AS VARCHAR)), 5, 12))::BIGINT"
    s"(CASE WHEN $w = 0 THEN ${WBits + 1} ELSE ${WBits + 1} - length(bin($w)) END)"
  }

  def hllContributionSql(maxRank: String): String =
    s"((1::BIGINT << $Scale) >> ($maxRank))"

  def hllEstimateSql(present: String, sumContrib: String): String = {
    val v = s"($M - $present)"
    val sumL = s"(CAST($sumContrib AS BIGINT) + $v * ${1L << Scale})"
    // the double literal is Double.toString of the Scala constant — both
    // engines parse it to the identical IEEE value
    val num = java.lang.Double.toString(
      Alpha * M.toDouble * M.toDouble * math.pow(2.0, Scale))
    val raw = s"($num / CAST($sumL AS DOUBLE))"
    s"""CAST(CASE WHEN $raw <= ${2.5 * M} AND $v > 0
       THEN round($M::DOUBLE * ln($M::DOUBLE / CAST($v AS DOUBLE)))
       ELSE round($raw) END AS BIGINT)"""
  }
}
