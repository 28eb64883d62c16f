package graft

import graft.operators.DedupOps

/** The jaccard family's candidate-mass guard (round 10; the jaccard
  * mirror of [[ContainmentGuardSpec]]): the probe must pre-count the
  * banded join's exact output, the pure tier decision must guard it,
  * and the guarded dispatcher must return the SAME rows as the blocked
  * quadratic comparator on either side of the bound.
  */
class JaccardGuardSpec extends SparkSpec {
  import DedupOps.{JaccardCandidateMass, jaccardTier}

  test("tier decision: storable candidate mass selects the banded scale tier") {
    assert(jaccardTier(JaccardCandidateMass(1000000L, 1.5e9)) == "banded")
    assert(jaccardTier(JaccardCandidateMass(0L, 0.0)) == "banded")
  }

  test("tier decision: over-mass but bounded corpus selects the quadratic comparator") {
    // the 150k-doc Zipf regime: mass past the bound, corpus <= 100k... at
    // 50k docs the blocked n^2/2 merge passes are bounded work
    assert(jaccardTier(JaccardCandidateMass(50000L, 3.0e9)) == "pairs")
  }

  test("tier decision: over-mass at scale fails loudly with the escape hatches") {
    val e = intercept[IllegalStateException](
      jaccardTier(JaccardCandidateMass(10000000L, 1.0e12)))
    assert(e.getMessage.contains("minhash"))
    assert(e.getMessage.contains("threshold"))
  }

  test("probe counts the candidate join's output exactly") {
    // the probe's sum over (lang, lenb, gh) of prefix-count x
    // posting-count must equal the row count the banded candidate
    // equijoin would actually generate (before its positional/self
    // predicates) - checked by materializing that bare join
    val sf = "/root/testdata/sf0.001"
    val m = DedupOps.jaccardMassProbe2(spark, sf)
    assert(m.candRows == m.bareJoinRows.toDouble,
      s"probe ${m.candRows} != bare join ${m.bareJoinRows}")
    spark.catalog.clearCache()
  }

  test("driver corpus (sf0.001): auto matches the quadratic tier") {
    val sf = "/root/testdata/sf0.001"
    val auto = DedupOps.ngramJaccardAuto(spark, sf)
      .orderBy("a_id", "b_id").collect().toSeq
    val pairs = DedupOps.ngramJaccardPairs(spark, sf)
      .orderBy("a_id", "b_id").collect().toSeq
    assert(auto == pairs)
    spark.catalog.clearCache()
  }
}
