package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Probability calibration for the quality-classifier stack: a trained
  * scorer (the LR filter, a fastText-style classifier) emits scores whose
  * ORDER is useful but whose VALUES are not probabilities — threshold
  * decisions ("keep everything above 0.8") then operate on fiction.
  * Isotonic regression (Zadrozny & Elkan, KDD 2002) fixes the values
  * without disturbing the order: the calibrated curve is the monotone
  * least-squares fit of the observed label rate over score bins.
  */
object Calibrate {

  /** Isotonic (PAV) calibration over `bins` equal-width score bins,
    * computed with the MINIMAX closed form rather than the sequential
    * pool-adjacent-violators sweep:
    *
    *   iso(i) = max_{j<=i} min_{k>=i} mean(pool j..k)
    *
    * — the textbook identity for the PAV solution, and the form a
    * relational engine can evaluate as two bounded joins instead of a
    * data-dependent loop. Pool means are held in integer MICROS
    * (`(pos·1e6) div cnt` — the Graph/LR floor-division discipline), so
    * both engines compare identical longs and the oracle replay is
    * hash-exact; the floor snaps each pool mean to 1e-6, which cannot
    * break the guaranteed monotonicity of a max-min matrix.
    *
    * Bins are equal-width over the OBSERVED score range, not over
    * [0,1]: an undertrained scorer concentrates its outputs in a thin
    * band (the LR fixture spans 0.012 of probability), and fixed [0,1]
    * edges would collapse everything into one vacuous bin. The range
    * pass is one (min, max) aggregate; the bin id is then PURE INTEGER
    * arithmetic on micro-scaled scores — `((s−min)·bins) div
    * (max−min+1)` — so the oracle's binning is bit-identical with no
    * float edge anywhere.
    *
    * Scale shape: the corpus-scale work is the (min,max) aggregate and
    * the bin histogram — both partial-aggregatable single passes.
    * Everything after operates on ≤ `bins` rows
    * (corpus-size-INDEPENDENT): the prefix-sum window, the j≤k pool
    * join (bins²/2 rows) and the j≤i≤k minimax join (bins³/2 rows) are
    * constant-sized model arithmetic, and applying the curve back to
    * documents is a broadcast join on the bin id. Empty bins simply
    * don't exist as pools — PAV over the present bins.
    *
    * Output: `(bin, cnt, pos, raw_micro, cal_micro)` — one row per
    * non-empty bin, `cal_micro` nondecreasing. */
  def isotonicBins(scored: DataFrame, score: Column, label: Column,
                   bins: Int = 16): DataFrame = {
    require(bins >= 2 && bins <= 256)
    val sm = scored.select(
      round(score * 1000000.0, 0).cast("long").as("sm"),
      label.cast("long").as("y"))
    val mm = sm.agg(min(col("sm")).as("mn"), max(col("sm")).as("mx"))
    val b = sm.crossJoin(broadcast(mm))
      .select(expr(s"((sm - mn) * $bins) div (mx - mn + 1)").as("bin"),
        col("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
    // single-partition window over <= bins rows — model-scale by
    // construction, never corpus-scale
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = b.select(col("bin"), col("cnt"), col("pos"),
      sum(col("cnt")).over(w).as("ccnt"),
      sum(col("pos")).over(w).as("cpos"))
    val jSide = cum.select(col("bin").as("jb"),
      (col("ccnt") - col("cnt")).as("cb4"),
      (col("cpos") - col("pos")).as("pb4"))
    val kSide = cum.select(col("bin").as("kb"),
      col("ccnt").as("kc"), col("cpos").as("kp"))
    val pools = jSide.join(kSide, col("jb") <= col("kb"))
      .select(col("jb"), col("kb"),
        expr("((kp - pb4) * 1000000L) div (kc - cb4)").as("pv"))
    val ids = b.select(col("bin").as("ib"))
    val iso = pools
      .join(ids, col("jb") <= col("ib") && col("kb") >= col("ib"))
      .groupBy(col("ib"), col("jb")).agg(min(col("pv")).as("mv"))
      .groupBy(col("ib")).agg(max(col("mv")).as("cal_micro"))
    b.join(iso, col("bin") === col("ib"))
      .select(col("bin").cast("long").as("bin"), col("cnt"), col("pos"),
        expr("(pos * 1000000L) div cnt").as("raw_micro"),
        col("cal_micro"))
  }

  /** Threshold-free ranking quality of a scorer: exact ROC-AUC
    * (Mann–Whitney U with the standard half-credit for ties) and
    * average precision, both computed from a SCORE-CELL HISTOGRAM
    * rather than a global per-row rank.
    *
    * Scores are snapped to 6-dp micro cells (the `isotonicBins`
    * discipline); the only corpus-scale work is the (cell → count,
    * positives) hash aggregate, after which every statistic lives on
    * ≤ 1e6+1 cell rows regardless of corpus size — the same reason the
    * quantile/median operators histogram first. A per-row rank window
    * (the textbook rank-sum route) would be a full sort of the corpus;
    * the cell form needs no row ever to leave its partition until the
    * bounded cell table. Cells are also MERGEABLE (counts add), so
    * per-shard histograms combine before one final fold.
    *
    * Exactness: with cells in ascending score order,
    * 2·U = Σ_c pos_c·(2·negBelow_c + neg_c) — pure BIGINT (safe while
    * total rows < ~2e9), and AUC = 2U / (2·P·N) is one final IEEE
    * division both engines perform identically. AP is defined at cell
    * granularity (every tied score is one threshold):
    * AP = Σ_c (pos_c/P)·(cumPos_c/cumCnt_c) in descending order, each
    * term floored to integer micros (`div` — the pool-mean discipline
    * above) so the sum is BIGINT-exact and engine-portable.
    *
    * Output: ONE row `(pos_n, neg_n, auc, avg_precision)`. */
  def rankingEval(scored: DataFrame, score: Column, label: Column): DataFrame = {
    val sm = scored.select(
      round(score * 1000000.0, 0).cast("long").as("sm"),
      label.cast("long").as("y"))
    val cells = sm.groupBy(col("sm"))
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
      .withColumn("neg", col("cnt") - col("pos"))
    // single-partition windows over the ≤1e6-cell table — bounded by
    // score granularity, never by corpus size
    val asc = Window.orderBy(col("sm"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val desc = Window.orderBy(col("sm").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = cells.select(col("cnt"), col("pos"), col("neg"),
      (sum(col("neg")).over(asc) - col("neg")).as("negbelow"),
      sum(col("pos")).over(desc).as("cumpos"),
      sum(col("cnt")).over(desc).as("cumcnt"))
    c.agg(
        sum(col("pos")).as("pos_n"),
        sum(col("neg")).as("neg_n"),
        sum(col("pos") * (col("negbelow") * 2 + col("neg"))).as("u2"),
        sum(expr("(pos * cumpos * 1000000L) div cumcnt")).as("ap_micro"))
      .select(col("pos_n"), col("neg_n"),
        // single-class input (pos_n or neg_n = 0) makes AUC's divisor 0
        // — undefined by construction (no ranking to evaluate), so emit
        // NULL explicitly rather than NaN/Infinity, matching
        // classifierEval's explicit zero-denominator convention
        when(col("pos_n") === 0 || col("neg_n") === 0,
          lit(null).cast("double"))
          .otherwise(round(col("u2") /
            (col("pos_n") * col("neg_n") * lit(2.0)), 6)).as("auc"),
        when(col("pos_n") === 0, lit(null).cast("double"))
          .otherwise(round(col("ap_micro") /
            (col("pos_n") * lit(1000000.0)), 6)).as("avg_precision"))
  }
}
