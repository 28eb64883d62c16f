package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusPipeline, EventOps}

/** First-principles bounds for the round-7 analytics panel ops
  * (ev_ltv / ev_forecast / ev_ab_cuped / corpus_stats). Cross-engine
  * exactness is the DuckDB gate's job; these pin the STATISTICAL
  * invariants the formulas must satisfy regardless of data.
  */
class AnalyticsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("ev_ltv: cumulative LTV is non-decreasing in age within a cohort") {
    import org.apache.spark.sql.expressions.Window
    val out = EventOps.evLtv(spark, sf)
    val w = Window.partitionBy(col("cohort_wk")).orderBy(col("age_wk"))
    val bad = out
      .withColumn("prev", lag(col("ltv"), 1).over(w))
      .filter(col("prev").isNotNull && col("ltv") < col("prev"))
    assert(bad.isEmpty, "LTV decreased with age — cumulative sum broken")
    assert(out.filter(col("n_users") <= 0 || col("age_wk") < 0).isEmpty)
  }

  test("ev_ltv: week-0 revenue reconciles with raw purchase totals") {
    val total = EventOps.evLtv(spark, sf)
      .agg(sum(expr("round(week_rev * 1000)"))).head().getDouble(0)
    val raw = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(sum(expr("CAST(round(value * 1000) AS BIGINT)"))).head().getLong(0)
    assert(total.toLong == raw, s"per-cohort weekly revenue ($total) must " +
      s"partition the raw purchase total ($raw)")
  }

  test("ev_survival: Kaplan-Meier invariants hold") {
    val rows = EventOps.evSurvival(spark, sf).orderBy(col("day")).collect()
    assert(rows.nonEmpty)
    // S(t) is a product of factors in [0,1]: non-increasing, within [0,1]
    val survs = rows.map(_.getDouble(4))
    assert(survs.forall(s => s >= 0.0 && s <= 1.0))
    survs.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-9, s"survival increased: $a -> $b")
    case _ => ()
    }
    // the risk set shrinks by exactly the prior days' exits, down to > 0
    val nRisk = rows.map(_.getLong(1))
    nRisk.sliding(2).foreach { case Array(a, b) =>
      assert(b < a, "risk set must strictly shrink across observed days")
    case _ => ()
    }
    // every user exits exactly once: events + censored partition the users
    val totalExits = rows.map(r => r.getLong(2) + r.getLong(3)).sum
    val nUsers = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    assert(totalExits == nUsers, s"exits $totalExits != users $nUsers")
  }

  test("ev_attribution_markov: zero conversions yields an empty frame, not NaN") {
    // a corpus with no purchase events has convTotal == 0 — removal-effect
    // division must not produce NaN credit rows (oracle mirrors: returns [])
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mkv").toString
    Seq(
      (1L, 1000000L, 1L, "view"), (1L, 2000000L, 2L, "click"),
      (2L, 1000000L, 3L, "view"), (2L, 3000000L, 4L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(EventOps.evAttributionMarkov(spark, dir).isEmpty,
      "no-conversion corpus must yield zero attribution rows")
  }

  test("ev_forecast: MAE and WAPE are non-negative and finite") {
    val rows = EventOps.evForecast(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mae, wape) = (r.getDouble(2), r.getDouble(3))
      assert(mae >= 0 && !mae.isNaN && !mae.isInfinite)
      assert(wape >= 0 && !wape.isNaN && !wape.isInfinite)
      // 30-day window, 7-day lag: at most 23 scored days
      assert(r.getLong(1) <= 23L)
    }
  }

  test("ev_ab_cuped: variance reduction is a squared correlation in [0,1)") {
    val rows = EventOps.evAbCuped(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vr = r.getDouble(7)
      assert(vr >= 0.0 && vr < 1.0, s"var_red=$vr outside [0,1)")
      assert(!r.getDouble(3).isNaN && !r.getDouble(6).isNaN)
    }
  }

  test("ev_ab_cuped: theta=0 degenerates to the plain difference in means") {
    // On a synthetic frame where X is constant (thd=0 rows are filtered),
    // verify instead on real data: the adjusted arm means differ from the
    // raw post-period arm means by exactly theta * (arm X mean - pooled X
    // mean) — recompute raw means independently and invert the adjustment.
    val cut = 1705363200000000L
    val u = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        (col("user_id") % 2).cast("int").as("variant"),
        expr(s"IF(ts div 1000 >= ${cut}L, CAST(round(value * 1000) AS BIGINT), 0L)").as("yq"),
        expr(s"IF(ts div 1000 < ${cut}L, CAST(round(value * 1000) AS BIGINT), 0L)").as("xq"))
      .groupBy(col("event_type"), col("user_id"), col("variant"))
      .agg(sum(col("yq")).as("y"), sum(col("xq")).as("x"))
    val raw = u.groupBy(col("event_type")).agg(
        avg(when(col("variant") === 0, col("y"))).as("my_a"),
        avg(when(col("variant") === 0, col("x"))).as("mx_a"),
        avg(col("x")).as("mx"))
    val j = EventOps.evAbCuped(spark, sf).join(raw, "event_type")
      .withColumn("recon",
        (col("my_a") - col("theta") * (col("mx_a") - col("mx"))) / 1000.0)
      .select(col("event_type"), col("mean_a_adj"), col("recon")).collect()
    j.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-9,
        s"${r.getString(0)}: adjustment identity broken: " +
          s"${r.getDouble(1)} vs ${r.getDouble(2)}")
    }
  }

  test("ev_ab_seq: always-valid p in (0,1], consistent with the likelihood ratio") {
    val rows = EventOps.evAbSeq(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lam, p) = (r.getDouble(4), r.getDouble(5))
      assert(lam > 0, s"lambda must be positive: $r")
      assert(p > 0 && p <= 1.0, s"p_seq out of range: $r")
      assert(math.abs(p - math.min(1.0, 1.0 / lam)) < 2e-6,
        s"p_seq != min(1, 1/lambda) beyond rounding: $r")
    }
  }

  test("ev_ab_power: MDE positive and rel/abs consistent with the baseline mean") {
    val rows = EventOps.evAbPower(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (base, mAbs, mRel) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(mAbs > 0 && mRel > 0 && base > 0, s"degenerate power row: $r")
      assert(math.abs(mRel - mAbs / base) < 1e-3,
        s"mde_rel inconsistent with mde_abs/baseline: $r")
    }
  }

  test("ev_pagerank: distribution sums to 1, floors hold, anchors reconcile") {
    val rows = EventOps.evPagerank(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.length
    val prSum = rows.map(_.getDouble(1)).sum
    // rounded to 1e-6 per row, so the sum may drift by n/2 ulps of the grid
    assert(math.abs(prSum - 1.0) <= n * 5e-7,
      s"pageranks must be a distribution, got sum=$prSum")
    rows.foreach { r =>
      // every state keeps at least the teleport floor (1-d)/n
      assert(r.getDouble(1) >= (1.0 - 0.85) / n - 5e-7, s"below floor: $r")
    }
    // every transition leaves one node and enters another: the exact
    // BIGINT anchors must agree with the ev_transitions total
    val inSum = rows.map(_.getLong(2)).sum
    val outSum = rows.map(_.getLong(3)).sum
    val transitions = EventOps.evTransitions(spark, sf)
      .agg(sum(col("n"))).head().getLong(0)
    assert(inSum == transitions && outSum == transitions,
      s"anchor mismatch: in=$inSum out=$outSum transitions=$transitions")
  }

  test("ev_pagerank: bit-deterministic across runs") {
    val a = EventOps.evPagerank(spark, sf).collect().toSeq
    val b = EventOps.evPagerank(spark, sf).collect().toSeq
    assert(a == b, "power iteration must be bit-deterministic")
  }

  test("ev_uplift: counts partition, uplift bounded, qini reconciles") {
    val rows = EventOps.evUplift(spark, sf).orderBy(col("score").desc).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nT, nC) = (r.getLong(1), r.getLong(2))
      val (cT, cC) = (r.getLong(3), r.getLong(4))
      assert(nT >= 1 && nC >= 1, "filtered bands must have both arms")
      assert(cT >= 0 && cT <= nT && cC >= 0 && cC <= nC)
      val uplift = r.getDouble(5)
      assert(uplift >= -1.0 && uplift <= 1.0, s"uplift out of range: $uplift")
      // uplift recomputes from the band's own counts
      val expect = BigDecimal(cT.toDouble / nT - cC.toDouble / nC)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(uplift == expect, s"uplift $uplift != $expect")
    }
    // the treatment split is the user_id parity — both arms populated
    val users = Tables.events(spark, sf)
      .select(col("user_id"), (col("user_id") % 2).as("t")).distinct()
    assert(users.filter(col("t") === 1).count() > 0)
    assert(users.filter(col("t") === 0).count() > 0)
  }

  test("corpus_stats: totals reconcile and rates are bounded") {
    val out = CorpusPipeline.corpusStats(spark, sf).cache()
    try {
      val nDocs = out.agg(sum(col("n_docs"))).head().getLong(0)
      assert(nDocs == Tables.documents(spark, sf).count())
      assert(out.filter(col("dup_bps") < 0 || col("dup_bps") > 10000).isEmpty)
      assert(out.filter(col("n_langs") <= 0 || col("avg_chars") <= 0).isEmpty)
    } finally out.unpersist()
  }
}
