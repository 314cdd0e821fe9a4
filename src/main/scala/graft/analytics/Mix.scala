package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mixture allocation for training-data assembly: how a GLOBAL token
  * budget splits across sources under per-source mixture weights and
  * per-source availability caps.
  */
object Mix {

  /** Water-filling allocation: alloc_s = min(cap_s, λ·w_s) with
    * Σ alloc_s = min(B, Σ cap_s) — proportional-to-weight up to each
    * source's cap, with the excess re-flowing to unsaturated sources.
    * This is the allocation a data mix computes when a small high-weight
    * source runs out before the budget does.
    *
    * Closed form, no iteration: f(λ) = Σ min(cap_s, λ·w_s) is piecewise
    * linear and increasing with breakpoints at r_s = cap_s/w_s, so
    * sorting by r and prefix-summing solves f(λ) = B in one pass —
    * source s is saturated ⟺ f(r_s) ≤ B, and
    * λ = (B − Σ_saturated cap) / (Σ_unsaturated w). Breakpoint ties are
    * harmless (f evaluates equal at tied rows); (r, source) ordering
    * keeps the prefix sums deterministic anyway.
    *
    * Input is one row per source. The single-partition windows are
    * deliberate: the frame is the already-aggregated source list
    * (#sources rows — dozens, not documents), while the corpus-scale
    * work (the caps) happens in the caller's aggregate.
    *
    * Returns (source, wt, cap, alloc, sat): alloc in cap's units
    * (double — callers floor for integer budgets), sat = true when the
    * source contributes everything it has. */
  def waterfillAlloc(src: DataFrame, source: Column, cap: Column,
                     weight: Column, budget: Double): DataFrame = {
    val base = src.select(source.as("source"),
      cap.cast("double").as("cap"), weight.cast("double").as("wt"))
      .withColumn("r", col("cap") / col("wt"))
    val ord = Window.orderBy(col("r"), col("source"))
    val all = ord.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    base
      .withColumn("pc", sum(col("cap")).over(ord))
      .withColumn("pw", sum(col("wt")).over(ord))
      .withColumn("totw", sum(col("wt")).over(all))
      .withColumn("sat",
        col("pc") + col("r") * (col("totw") - col("pw")) <= lit(budget))
      .withColumn("satpc", max(when(col("sat"), col("pc"))).over(all))
      .withColumn("satpw", max(when(col("sat"), col("pw"))).over(all))
      // when sat, alloc = cap EXACTLY (no float residue from λ·w); the
      // unsaturated branch never divides by zero because an unsaturated
      // row's weight is absent from satpw
      .withColumn("alloc", when(col("sat"), col("cap")).otherwise(
        least(col("cap"),
          (lit(budget) - coalesce(col("satpc"), lit(0.0)))
            / (col("totw") - coalesce(col("satpw"), lit(0.0)))
            * col("wt"))))
      .select(col("source"), col("wt"), col("cap"), col("alloc"),
        col("sat"))
  }

  /** Data-constrained epoch allocation — the REPETITION-aware mixture
    * (Muennighoff et al., "Scaling Data-Constrained Language Models",
    * NeurIPS 2023: repeated epochs carry diminishing but non-zero
    * value): when the token budget exceeds the unique corpus, decide
    * how many EPOCHS of each source to train on, not just how many
    * tokens. Model: epoch e of source s is a slab of `cap_s` tokens at
    * utility density `w_s · decay^(e−1)` (the geometric decay is the
    * standard proxy for the paper's fitted repeated-token value; decay
    * 0.5 ≈ its "repeating twice is nearly as good as fresh, four times
    * is half" regime). The budget-constrained optimum is the greedy
    * slab fill in descending utility density — provably optimal because
    * slabs are independent and densities are constant within a slab
    * (the fractional-knapsack argument), and within a source densities
    * DECREASE with e, so granted epochs are automatically contiguous
    * (epoch 3 can never outrank epoch 2; no gap repair needed).
    *
    * Deterministic closed form, same discipline as `waterfillAlloc`:
    * explode #sources × maxEpochs slabs (dozens of rows — the input is
    * the caller's already-aggregated source list), ONE prefix-sum
    * window over (util desc, source, epoch), boundary slab takes the
    * remainder. Returns per source: cap, full_epochs (completely
    * granted slabs), alloc (total tokens incl. the fractional boundary
    * slab), epochs (alloc/cap). Σ alloc = min(budget, E·Σcap). */
  def epochAllocation(src: DataFrame, source: Column, uniqueTokens: Column,
                      weight: Column, budget: Double, maxEpochs: Int = 4,
                      decay: Double = 0.5): DataFrame = {
    val base = src.select(source.as("source"),
      uniqueTokens.cast("double").as("cap"),
      weight.cast("double").as("wt"))
    val slabs = base
      .select(col("source"), col("cap"), col("wt"),
        explode(sequence(lit(1), lit(maxEpochs))).as("epoch"))
      .withColumn("util", col("wt") * pow(lit(decay), col("epoch") - 1))
    val ord = Window.orderBy(col("util").desc, col("source"), col("epoch"))
    slabs
      .withColumn("pc", sum(col("cap")).over(ord))
      .withColumn("alloc", greatest(lit(0.0), least(col("cap"),
        lit(budget) - (col("pc") - col("cap")))))
      // A slab is FULL iff its prefix-sum boundary fits the budget —
      // the primal condition, not the derived float equality
      // alloc === cap (which `least(cap, budget - (pc - cap))` can miss
      // by an ulp when the subtraction rounds down, and which a cap = 0
      // slab satisfies vacuously on every epoch, reporting maxEpochs
      // full epochs of zero tokens).
      .groupBy(col("source"))
      .agg(min(col("cap")).as("cap"), min(col("wt")).as("wt"),
        sum(when(col("cap") > 0.0 && col("pc") <= lit(budget), lit(1L))
          .otherwise(lit(0L))).as("full_epochs"),
        sum(col("alloc")).as("alloc"))
      .withColumn("epochs", when(col("cap") === 0.0, lit(0.0))
        .otherwise(col("alloc") / col("cap")))
  }

  /** DoReMi-style domain reweighting (Xie et al., "DoReMi: Optimizing
    * Data Mixtures Speeds Up Language Model Pretraining", NeurIPS 2023;
    * the Group-DRO ascent of Sagawa et al., ICLR 2020): iteratively
    * upweight the domains whose loss EXCEEDS the current
    * mixture-weighted average — the excess-loss signal — then smooth
    * toward uniform so no domain starves. Differences from the paper,
    * chosen for engine-exactness: the per-domain loss is a FROZEN proxy
    * score (here: unigram-LM bits-per-token; the paper re-trains a proxy
    * model between updates — that loop lives outside the engine), and
    * the update is the linearized multiplicative-weights rule
    * `w ← α · (1 + η·excess)` (Arora–Hazan–Kale's (1+ηm) form) instead
    * of `exp(η·excess)` — exp is not IEEE-reproducible across engines,
    * while the (1+ηm) form is all integer micros arithmetic and replays
    * bit-exactly in SQL. Iterating against the mixture-weighted average
    * is what makes rounds non-degenerate under a frozen loss: as mass
    * moves onto hot domains the average rises and the update
    * self-attenuates toward the DRO equilibrium.
    *
    * All arithmetic is exact integers (BigInt here, HUGEINT in the
    * oracle): per round, avg = ⌊Σαl/Σα⌋, excess = max(l−avg, 0),
    * factor = 1e6 + ⌊η·excess/1e6⌋, w = α·factor,
    * α' = ⌊w·1e6/Σw⌋, α'' = ⌊(1e6−c)·α'/1e6⌋ + ⌊c/k⌋.
    *
    * The input is the caller's already-aggregated per-source loss table
    * (|sources| rows — dozens); the fold is driver-side model-scale
    * iteration (the Lloyd/Markov discipline) and the corpus-scale work
    * (the loss aggregate) stays in the caller's one pass. Returns
    * (source, loss_micro, weight_micro) with weights in micros summing
    * to ~1e6 (floor residue ≤ k + iters). */
  def doremiWeights(lossBySource: DataFrame, source: Column,
                    lossMicro: Column, iters: Int = 5,
                    etaPerBitMicro: Long = 200000L,
                    smoothMicro: Long = 100000L): DataFrame = {
    val spark = lossBySource.sparkSession
    val rows = lossBySource
      .select(source.cast("string").as("s"), lossMicro.cast("long").as("l"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val k = rows.length
    require(k >= 1, "doremiWeights needs >= 1 source")
    val M = BigInt(1000000L)
    var alpha: Seq[BigInt] = Seq.fill(k)(M / k)
    (1 to iters).foreach { _ =>
      val sumA = alpha.sum
      val avg = alpha.zip(rows).map { case (a, (_, l)) => a * l }.sum / sumA
      val raw = alpha.zip(rows).map { case (a, (_, l)) =>
        val excess = (BigInt(l) - avg).max(BigInt(0))
        a * (M + BigInt(etaPerBitMicro) * excess / M)
      }
      val sumW = raw.sum
      alpha = raw.map { w =>
        val aPrime = w * M / sumW
        BigInt(1000000L - smoothMicro) * aPrime / M +
          BigInt(smoothMicro) / k
      }
    }
    import spark.implicits._
    rows.zip(alpha).map { case ((s, l), a) => (s, l, a.toLong) }
      .toSeq.toDF("source", "loss_micro", "weight_micro")
  }

  /** Neyman-optimal stratified sampling allocation (Neyman, JRSS 1934):
    * split a fixed sample budget across strata proportionally to
    * `N_h · S_h` — strata that are BIG and INTERNALLY VARIED get the
    * samples; a huge but homogeneous stratum needs few. This is the
    * minimum-variance design for estimating the population mean of the
    * measure under stratified sampling, and the principled upgrade over
    * the proportional split `sample_per_source` takes for granted.
    *
    * Determinism: per-stratum variance from exact int64 moments
    * combined in decimal(38,0) (the q67 overflow discipline), then
    * `sd_kilo = floor(1000·S_h)` — one floor of an IEEE-identical
    * double, after which EVERYTHING is integer: weights `w = n·sd_kilo`,
    * base shares `(B·w) div Σw`, and the leftover `B − Σbase` handed out
    * by largest remainder (`(B·w) mod Σw` desc, stratum asc) — the exact
    * Hamilton apportionment, so `Σ alloc = B` always. All-constant
    * strata (Σw = 0) fall back to proportional-to-n shares with the
    * same remainder scheme.
    *
    * Scale: ONE stratum-keyed aggregate touches the corpus
    * (partial-aggregatable); every window below it runs on the
    * |strata|-row frame, never the corpus. Overflow: `B·w` is computed
    * in decimal(38,0) unconditionally (the RR-debias discipline), so
    * there is no silent int64 wrap at any B·n_h·sd_kilo — the only
    * int64 bound left is `w = n·sd_kilo` itself (n ≤ ~9e12 rows per
    * stratum at sd_kilo ≤ 1e6), enforced by the moment aggregate's own
    * exactness.
    *
    * Output: `(stratum, n_docs, sd_kilo, alloc)`, one row per stratum. */
  def neymanAllocation(df: DataFrame, stratum: Column, measure: Column,
                       budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val st = df.select(stratum.cast("string").as("stratum"),
        measure.cast("long").as("x"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("x")).cast("long").as("s1"),
        // Σx² in decimal(38,0): int64 dies at n·x²max > 2^63 (r15)
        sum(col("x").cast("decimal(38,0)") * col("x"))
          .cast("decimal(38,0)").as("s2"))
    val variance = (col("n").cast("decimal(38,0)") * col("s2") -
        col("s1").cast("decimal(38,0)") * col("s1")).cast("double") /
      (col("n").cast("double") *
        greatest(col("n") - 1L, lit(1L)).cast("double"))
    // single-partition windows below are deliberate: the frame is
    // |strata| rows (the corpus never reaches a window)
    val wAll = Window.partitionBy(lit(0))
    st.withColumn("sd_kilo", floor(sqrt(variance) * 1000.0).cast("long"))
      .withColumn("w", col("n") * col("sd_kilo"))
      .withColumn("tw", sum(col("w")).over(wAll))
      .withColumn("tn", sum(col("n")).over(wAll))
      .withColumn("base",
        when(col("tw") > 0L,
          expr(s"CAST((CAST($budget AS DECIMAL(38,0)) * w) div tw" +
            " AS BIGINT)"))
          .otherwise(expr(s"(${budget}L * n) div tn")))
      .withColumn("rem",
        when(col("tw") > 0L,
          expr(s"(CAST($budget AS DECIMAL(38,0)) * w) % tw"))
          .otherwise(
            expr(s"CAST((${budget}L * n) % tn AS DECIMAL(38,0))")))
      .withColumn("leftn", lit(budget) - sum(col("base")).over(wAll))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("stratum"))))
      .select(col("stratum"), col("n").as("n_docs"), col("sd_kilo"),
        (col("base") +
          when(col("rk") <= col("leftn"), lit(1L)).otherwise(lit(0L)))
          .as("alloc"))
  }
}
