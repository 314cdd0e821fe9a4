package graft.analytics

import graft.{SparkEntry, SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Invariant pins for the round-12 experiment-health / profiling tier:
  * Kaplan-Meier survival (q56), truncated-EWMA control chart (q57), the
  * SRM gate (q58), CM inner-product join estimation, JS divergence,
  * quantile normalization, and the Pareto front. The oracle gate checks
  * value equality; these pin the SEMANTIC contracts (monotonicity,
  * overestimate-only, dominance-freeness) that a value hash can't see.
  */
class ExperimentProfileSpec extends SparkSuite {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf0001)

  test("q56 Kaplan-Meier: survival is non-increasing, risk set " +
    "telescopes from the user count, and S hits 0 only on a d = n row") {
    val rows = run("q56_survival_km").orderBy("t_days").collect()
    assert(rows.nonEmpty)
    val users = Tables.load(spark, sf0001, "events")
      .select("user_id").distinct().count()
    assert(rows.head.getAs[Long]("n_risk") === users,
      "first risk set must be every user")
    val km = rows.map(_.getAs[Double]("km_survival"))
    assert(km.zip(km.tail).forall { case (a, b) => b <= a + 1e-12 },
      "S(t) must be non-increasing")
    assert(km.forall(s => s >= 0.0 && s <= 1.0))
    rows.foreach { r =>
      val dead = r.getAs[Double]("km_survival") == 0.0
      val dEqN = r.getAs[Long]("d_churn") == r.getAs[Long]("n_risk")
      if (dEqN) assert(dead, "d = n must zero the curve")
    }
    // risk sets telescope: n_risk(t) - (d+c)(t) = n_risk(next t)
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(a.getAs[Long]("n_risk") - a.getAs[Long]("d_churn") -
        a.getAs[Long]("c_censored") === b.getAs[Long]("n_risk"))
    }
  }

  test("q57 EWMA: a warm-up row smooths to exactly a*x, and the chart " +
    "stays within the series' range") {
    val rows = run("q57_ewma_hours").collect()
    assert(rows.nonEmpty)
    rows.filter(_.getAs[Long]("hour_idx") == 1L).foreach { r =>
      assert(math.abs(r.getAs[Double]("ewma") -
        0.25 * r.getAs[Long]("cnt")) < 1e-6,
        "first observed hour has only itself in the window")
    }
    assert(rows.forall(r => Set(0L, 1L)(r.getAs[Long]("anom"))))
    assert(rows.forall(_.getAs[Double]("ewma") > 0.0))
  }

  test("q58 SRM: the _all segment counts every user once and the flag " +
    "replays as a pure integer inequality") {
    val rows = run("q58_srm_check").collect()
    val all = rows.find(_.getAs[String]("segment") == "_all").get
    val users = Tables.load(spark, sf0001, "events")
      .select("user_id").distinct().count()
    assert(all.getAs[Long]("n_a") + all.getAs[Long]("n_b") === users)
    rows.foreach { r =>
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      val expect =
        if ((na - nb) * (na - nb) * 1000000L > 3841459L * (na + nb)) 1L
        else 0L
      assert(r.getAs[Long]("srm_flag") === expect)
    }
  }

  test("profile_cm_join_est: the CM inner product never underestimates " +
    "the true join cardinality (collisions only add)") {
    val r = run("profile_cm_join_est").collect().head
    assert(r.getAs[Long]("est_join") >= r.getAs[Long]("exact_join"))
    assert(r.getAs[Long]("exact_join") > 0L, "fixture joins must overlap")
  }

  test("corpus_js_divergence: base-e JSD lands in [0, ln 2] for every " +
    "source pair and covers all pairs once") {
    val rows = run("corpus_js_divergence").collect()
    val nSrc = Tables.load(spark, sf0001, "documents")
      .select("source").distinct().count()
    assert(rows.length === (nSrc * (nSrc - 1) / 2).toInt)
    rows.foreach { r =>
      val j = r.getAs[Double]("jsd")
      assert(j >= 0.0 && j <= math.log(2.0) + 1e-9, s"jsd $j out of range")
    }
  }

  test("text_quality_qnorm: normalization preserves within-source order " +
    "and only emits values from the global n_chars multiset") {
    val df = run("text_quality_qnorm")
    val global = Tables.load(spark, sf0001, "documents")
      .select(col("n_chars").cast("long")).collect()
      .map(_.getLong(0)).toSet
    val rows = df.collect()
    assert(rows.forall(r => global(r.getAs[Long]("qnorm_chars"))))
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r =>
        (r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id")))
      val qn = sorted.map(_.getAs[Long]("qnorm_chars"))
      assert(qn.zip(qn.tail).forall { case (a, b) => a <= b },
        "rank map must be monotone within a source")
    }
  }

  test("q59 Mann-Kendall: S and the tie-corrected variance are exact " +
    "integers and the Theil-Sen median lies inside the slope range") {
    val rows = run("q59_trend_mk").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_days")
      assert(r.getAs[Long]("var18") >= 0L)
      assert(r.getAs[Long]("var18") <= n * (n - 1) * (2 * n + 5))
      val s = r.getAs[Long]("s_stat")
      assert(math.abs(s) <= n * (n - 1) / 2)
    }
  }

  test("q60/q61 Markov: rows of the transition matrix sum to their " +
    "marginal, probabilities floor-sum to <= 1e6, and 12 power rounds " +
    "conserve stationary mass up to floor loss") {
    val trans = run("q60_markov_trans").collect()
    trans.groupBy(_.getAs[String]("from_type")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("n")).sum === rs.head.getAs[Long]("n_from"))
      val pSum = rs.map(_.getAs[Long]("p_micro")).sum
      assert(pSum <= 1000000L && pSum > 1000000L - rs.length,
        s"row floor-mass $pSum")
    }
    val pi = run("q61_markov_stationary").collect()
      .map(_.getAs[Long]("pi"))
    assert(pi.forall(_ >= 0L))
    val mass = pi.sum
    assert(mass <= 1000000000000L && mass >= 1000000000000L - 10000L,
      s"stationary mass $mass drifted beyond accumulated floor loss")
  }

  test("q62 winsorized means: clip points order, the winsorized mean " +
    "sits inside [lo, hi], and raw vs winsorized differ only via tails") {
    val rows = run("q62_abtest_winsor").collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      val lo = r.getAs[Long]("lo_cents")
      val hi = r.getAs[Long]("hi_cents")
      assert(lo <= hi)
      val wm = r.getAs[Long]("winsor_micro")
      assert(wm >= lo * 10000L && wm <= hi * 10000L)
    }
  }

  test("eval_brier_bins: rank deciles are balanced, mean predicted " +
    "probability is monotone across them, and MSE terms are bounded") {
    val rows = run("eval_brier_bins").orderBy("bin").collect()
    assert(rows.length === 10)
    val mp = rows.map(_.getAs[Long]("mean_p_micro"))
    assert(mp.zip(mp.tail).forall { case (a, b) => a <= b },
      "rank-ordered bins must have non-decreasing mean prediction")
    rows.foreach { r =>
      assert(r.getAs[Long]("brier_micro2") >= 0L &&
        r.getAs[Long]("brier_micro2") <= 1000000000000L)
      assert(r.getAs[Long]("frac_pos_micro") <= 1000000L)
    }
  }

  test("profile_psi_drift: every PSI term is non-negative (same-sign " +
    "product by construction) and the total replays from the terms") {
    val rows = run("profile_psi_drift").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("term") >= 0.0))
    val psi = rows.head.getAs[Double]("psi")
    assert(rows.forall(_.getAs[Double]("psi") === psi))
    assert(math.abs(rows.map(_.getAs[Double]("term")).sum - psi) < 1e-5)
    assert(psi >= 0.0)
  }

  test("eval_lsh_quality: the banding's candidate set contains the hits " +
    "it claims and clears the recall floor the verify stage relies on") {
    val r = run("eval_lsh_quality").collect().head
    val (ne, nc, nh) = (r.getAs[Long]("n_exact"), r.getAs[Long]("n_cand"),
      r.getAs[Long]("n_hit"))
    assert(nh <= ne && nh <= nc)
    assert(r.getAs[Long]("recall_micro") >= 900000L,
      "16x2 banding must catch >=90% of 0.5-Jaccard pairs")
    assert(r.getAs[Long]("precision_micro") > 0L &&
      r.getAs[Long]("precision_micro") <= 1000000L)
  }

  test("q63 bootstrap: the percentile CI is ordered, replayable, and " +
    "bracketed by the resampled-diff extremes") {
    val r = run("q63_bootstrap_ci").collect().head
    assert(r.getAs[Long]("n_boot") === 200L)
    assert(r.getAs[Long]("ci_lo_micro") <= r.getAs[Long]("ci_hi_micro"))
    assert(r.getAs[Long]("n_a") > 0L && r.getAs[Long]("n_b") > 0L)
    // deterministic resampling: a second run is bit-identical
    val r2 = run("q63_bootstrap_ci").collect().head
    assert(r === r2)
  }

  test("q64 DiD: the estimate replays from its own four cells and every " +
    "cell mean is a positive integer micro amount") {
    val r = run("q64_did_readout").collect().head
    val did = (r.getAs[Long]("post_a") - r.getAs[Long]("pre_a")) -
      (r.getAs[Long]("post_b") - r.getAs[Long]("pre_b"))
    assert(r.getAs[Long]("did_micro") === did)
    Seq("pre_a", "post_a", "pre_b", "post_b").foreach { c =>
      assert(r.getAs[Long](c) > 0L, s"cell $c")
    }
  }

  test("q65 CUSUM: S telescopes to zero over the full span, so the " +
    "scan's argmax is interior and its |S| positive on a non-flat " +
    "series") {
    val rows = run("q65_cusum_change").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // S_n = n*T - n*T = 0: an argmax with |S| > 0 is strictly interior
      if (r.getAs[Long]("s_abs_max") > 0L) {
        assert(r.getAs[Long]("change_day") < Long.MaxValue)
        assert(math.abs(r.getAs[Long]("s_at_change")) ===
          r.getAs[Long]("s_abs_max"))
      }
    }
  }

  test("privacy_t_close: TV distance is a proper distance in [0,1] and " +
    "the flag replays from the rounded value") {
    val rows = run("privacy_t_close").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tv = r.getAs[Double]("tv_dist")
      assert(tv >= 0.0 && tv <= 1.0)
      assert(r.getAs[Long]("meets_t") === (if (tv <= 0.2) 1L else 0L))
    }
  }

  test("profile_dedup_impact: kept never exceeds total and the drop " +
    "fractions replay from the counts") {
    val rows = run("profile_dedup_impact").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("toks_kept") <= r.getAs[Long]("n_toks"))
      val dd = (r.getAs[Long]("n_docs") - r.getAs[Long]("n_kept")) *
        1000000L / r.getAs[Long]("n_docs")
      assert(r.getAs[Long]("doc_drop_micro") === dd)
    }
    // the corpus keeps exactly one doc per distinct fingerprint
    val kept = rows.map(_.getAs[Long]("n_kept")).sum
    val fps = Tables.load(spark, sf0001, "documents")
      .select(md5(col("text"))).distinct().count()
    assert(kept === fps)
  }

  test("eval_ece: the scalar replays from the diagram's own bins and " +
    "is bounded by the worst per-bin gap") {
    val bins = run("eval_brier_bins").collect()
    val r = run("eval_ece").collect().head
    val n = bins.map(_.getAs[Long]("n")).sum
    assert(r.getAs[Long]("n_total") === n)
    val gapW = bins.map(b => b.getAs[Long]("n") *
      math.abs(b.getAs[Long]("mean_p_micro") -
        b.getAs[Long]("frac_pos_micro"))).sum
    assert(r.getAs[Long]("ece_micro") === gapW / n)
    val maxGap = bins.map(b => math.abs(b.getAs[Long]("mean_p_micro") -
      b.getAs[Long]("frac_pos_micro"))).max
    assert(r.getAs[Long]("ece_micro") <= maxGap)
  }

  test("profile_gini: the coefficient sits in [0, 1) and a uniform " +
    "synthetic source scores ~0") {
    val rows = run("profile_gini").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= -1e-9 && g < 1.0, s"gini $g out of range")
    }
  }

  test("q66 MASE: error sums replay as integers and the scorecard's " +
    "ratio identity holds") {
    val rows = run("q66_mase_seasonal").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_eval") ===
        r.getAs[Long]("n_days") - 7L)
      val mase = r.getAs[java.lang.Long]("mase_micro")
      if (mase != null) assert(mase >= 0L)
      assert(r.getAs[Long]("mae_seasonal_micro") >= 0L)
    }
  }

  test("privacy_entropy_l: per-class entropy is bounded by ln k and the " +
    "release flag replays from the rounded value") {
    val rows = run("privacy_entropy_l").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy")
      val k = r.getAs[Long]("k")
      assert(h >= -1e-9 && h <= math.log(k.toDouble) + 1e-9)
      val expect = if (h >= 1.098612) 1L else 0L
      assert(r.getAs[Long]("meets_entropy_3") === expect)
      // a single-value class has zero entropy regardless of k
      if (r.getAs[Long]("l_distinct") == 1L) assert(h === 0.0)
    }
  }

  test("mm_near_dup: byte-identical payloads score Jaccard 1 and every " +
    "emitted pair clears the integer 0.5 threshold") {
    val rows = run("mm_near_dup").collect()
    assert(rows.nonEmpty, "fixture near-dups must surface")
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.5 - 1e-9 && j <= 1.0)
    }
    // exact-dup docs (dedup_exact's fixture) share every frame
    assert(rows.exists(_.getAs[Double]("jaccard") == 1.0))
  }

  test("profile_pareto_front: no emitted doc is strictly dominated by " +
    "ANY doc in the corpus (front completeness is the oracle's job)") {
    val metric = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("n_chars").cast("long").as("nc"),
        size(array_distinct(filter(split(lower(col("text")), " "),
          x => x =!= ""))).cast("long").as("dw"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val front = run("profile_pareto_front").collect()
      .map(r => (r.getAs[Long]("n_chars"), r.getAs[Long]("n_dwords")))
    front.foreach { case (nc, dw) =>
      val dominated = metric.exists { case (nc2, dw2) =>
        nc2 >= nc && dw2 >= dw && (nc2 > nc || dw2 > dw)
      }
      assert(!dominated, s"front point ($nc, $dw) is dominated")
    }
  }
}
