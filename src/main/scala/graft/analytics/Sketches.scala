package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus-profiling sketches. At 100 TB you cannot afford
  * exact per-group distinct counts or exact full-vocabulary frequency
  * tables as a ROUTINE profiling pass — sketches bound the state:
  * KMV (k minimum values — Bar-Yossef et al. RANDOM 2002) holds k
  * hashes per group, count-min (Cormode & Muthukrishnan J.Alg 2005)
  * holds a fixed d×w grid regardless of corpus size.
  *
  * Both ride the repo's md5-derived 60-bit portable hash, so the
  * sketches are bit-identical across engines and the DuckDB oracle
  * checks them to hash equality — the same discipline as the minhash /
  * simhash / SRP stacks ("approximate in estimate, exact in
  * construction").
  */
object Sketches {

  /** The engine-portable 60-bit hash (first 15 md5 hex digits). */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** KMV distinct-count estimate per group: hash every item to 60 bits,
    * keep the k smallest DISTINCT hashes per group, estimate
    * |distinct| = (k-1) · 2^60 / h_(k). When a group holds fewer than k
    * distinct hashes the sketch IS the exact distinct set and the exact
    * count is returned.
    *
    * Scale: the global k-smallest per group never passes through one
    * giant per-group sort — hashes are first pruned to the k smallest
    * per (group, hash-bucket) in `nBuckets` well-distributed partitions
    * (the global k smallest are necessarily among their bucket's k
    * smallest), so the final per-group window sees ≤ nBuckets·k rows
    * per group, constant in corpus size. Estimate arithmetic is one
    * exactly-representable power of two, one double division, one
    * half-up round — engine-portable. */
  def kmvDistinct(df: DataFrame, group: Column, item: Column, k: Int,
                  nBuckets: Int = 64): DataFrame =
    kmvSignature(df, group, item, k, nBuckets).groupBy(col("grp"))
      .agg(max(when(col("rn") === k, col("h"))).as("hk"),
        count(lit(1)).as("nh"))
      .select(col("grp"),
        when(col("hk").isNotNull,
          round(lit((k - 1).toDouble) * lit(1152921504606846976.0)
            / col("hk").cast("double"), 0).cast("long"))
          .otherwise(col("nh")).as("est_distinct"))

  /** The k smallest distinct hashes per group — the KMV / theta-sketch
    * SIGNATURE `(grp, h, rn)` with rn the 1-based rank. Exposed because
    * the signature, not the estimate, is the mergeable/composable form:
    * set-operation estimators (`kmvOverlap`) and signature unions
    * (re-take the k smallest of a union) both read it. Bucketed
    * pre-prune as documented on `kmvDistinct`. */
  def kmvSignature(df: DataFrame, group: Column, item: Column, k: Int,
                   nBuckets: Int = 64): DataFrame = {
    require(k >= 2)
    val hashes = df.select(group.as("grp"), h60(item).as("h")).distinct()
    hashes
      .withColumn("bkt", pmod(col("h"), lit(nBuckets)))
      .withColumn("brn", row_number().over(
        Window.partitionBy(col("grp"), col("bkt")).orderBy(col("h"))))
      .filter(col("brn") <= k)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("h"))))
      .filter(col("rn") <= k)
      .select(col("grp"), col("h"), col("rn"))
  }

  /** Pairwise INTERSECTION-cardinality estimates between groups from
    * their KMV signatures — the theta-sketch set-operation framework
    * (Dasgupta et al., "Theta sketches"): below θ = min of the two
    * k-th-smallest hashes, each signature holds EVERY set hash, so the
    * common hashes below θ are an exact sample of A∩B at sampling rate
    * θ/2^60, and est|A∩B| = c · 2^60/θ. Where `corpus_similarity`
    * estimates the Jaccard RATIO via MinHash, this estimates the
    * ABSOLUTE overlap count — "how many distinct shingles do two crawls
    * share" without an exact distinct join.
    *
    * A group with fewer than k distinct hashes has no hk — its side is
    * exact, θ degrades to the OTHER side's hk (or 2^60 when both are
    * exact, making c itself the exact intersection).
    *
    * Scale: corpus-scale work is the signature build; the pair stage is
    * |groups|²/2 rows of ≤k-element sorted-array merges
    * (`SortedLongIntersectCount`), corpus-size-independent. Output:
    * `(a_grp, b_grp, est_inter)` for a_grp < b_grp. */
  def kmvOverlap(sig: DataFrame, k: Int): DataFrame = {
    val full = 1152921504606846976L // 2^60
    val packed = sig.groupBy(col("grp"))
      .agg(sort_array(collect_list(col("h"))).as("hs"),
        max(when(col("rn") === k, col("h"))).as("hk"))
    val a = packed.select(col("grp").as("a_grp"), col("hs").as("a_hs"),
      col("hk").as("a_hk"))
    val b = packed.select(col("grp").as("b_grp"), col("hs").as("b_hs"),
      col("hk").as("b_hk"))
    a.join(b, col("a_grp") < col("b_grp"))
      .withColumn("theta", least(coalesce(col("a_hk"), lit(full)),
        coalesce(col("b_hk"), lit(full))))
      .withColumn("c", graft.functions.HashExpressions
        .sortedLongIntersectCount(
          filter(col("a_hs"), h => h < col("theta")),
          filter(col("b_hs"), h => h < col("theta"))))
      .select(col("a_grp"), col("b_grp"),
        round(col("c") * lit(1152921504606846976.0)
          / col("theta").cast("double"), 0).cast("long").as("est_inter"))
  }

  /** HyperLogLog distinct-count estimate per group (Flajolet et al.,
    * AofA 2007): bucket = the hash's low `p` bits, register = the max
    * leading-zero rank of the remaining 60-p bits, estimate = the
    * bias-corrected harmonic mean over the 2^p registers, with the
    * standard linear-counting switch when empty buckets remain. Fixed
    * 2^p longs of state per group at ANY corpus size — the constant-
    * memory companion to `kmvDistinct` (whose state is k hashes), with
    * ~1.04/sqrt(2^p) relative error (~4.6% at p=9).
    *
    * Engine-portable construction (the KMV discipline — "approximate in
    * estimate, exact in construction"): the rank is derived from the
    * BINARY STRING length of the rest bits (`length(bin(rest))` —
    * identical minimal-binary semantics in Spark and DuckDB), never
    * from float log2; the harmonic sum is held as the exact integer
    * Σ 2^(maxRank − M_j) (empty buckets contribute 2^maxRank), so the
    * only float steps are ONE literal/long division and ONE half-up
    * round; the linear-counting branch reads a PRECOMPUTED 2^p-entry
    * literal table (round(m·ln(m/V))) shared verbatim by both engines —
    * no runtime transcendental, no libm divergence surface.
    *
    * Scale: register build is one partial-aggregatable max over
    * (group, bucket) — map-side state is the 2^p registers per group,
    * the exchange carries ≤ groups × 2^p rows. No distinct(), no
    * window, no sort. */
  /** The scaled HLL numerator alpha_m · m² · 2^(60-p+1), shared with the
    * oracle as ONE double literal (Double.toString round-trips, so both
    * engines parse the identical IEEE value). */
  def hllNum(p: Int): Double = {
    val m = 1 << p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    alpha * m.toDouble * m.toDouble * (1L << (60 - p + 1)).toDouble
  }

  /** The linear-counting lookup round(m·ln(m/V)) for V = 1..m,
    * PRECOMPUTED so neither engine evaluates ln at query time (libm
    * last-ulp divergence between JVMs and DuckDB would otherwise be a
    * cross-engine hazard at round boundaries). */
  def hllLcTable(p: Int): IndexedSeq[Long] = {
    val m = 1 << p
    (1 to m).map(v => math.round(m.toDouble * math.log(m.toDouble / v)))
  }

  /** The HLL register table `(grp, bkt, mr)` — max rank per (group,
    * bucket). Exposed because registers are the MERGEABLE form: sketches
    * built over disjoint (or even overlapping) slices combine by a plain
    * `max` per (group, bucket) and estimate EXACTLY what a single pass
    * over the union would — max is idempotent, commutative and
    * associative, so per-day/per-shard register tables persist once and
    * answer distinct-counts over any slice combination without touching
    * the raw data again. That mergeability, not the estimate itself, is
    * why HLL is the 100 TB cardinality tool. */
  def hllRegisters(df: DataFrame, group: Column, item: Column,
                   p: Int = 9): DataFrame = {
    require(p >= 4 && p <= 16)
    df.select(group.as("grp"), hllBucketRho(item, p).as("br"))
      .select(col("grp"), col("br.bkt").as("bkt"), col("br.rho").as("rho"))
      .groupBy(col("grp"), col("bkt")).agg(max(col("rho")).as("mr"))
  }

  /** The per-item `(bkt, rho)` struct — the row-level core of
    * `hllRegisters`, exposed so the STREAMING running-distinct operator
    * folds the IDENTICAL arithmetic into keyed state (its estimates are
    * then bit-equal to a batch `hllDistinct` over the same rows).
    * `shiftright(h, p)` is `h div 2^p` exactly (h60 is non-negative);
    * no double ever touches the 60-bit hash. */
  def hllBucketRho(item: Column, p: Int): Column = {
    val m = 1 << p
    val maxRank = 60 - p + 1
    val h = h60(item)
    val rest = shiftright(h, p)
    struct(pmod(h, lit(m.toLong)).as("bkt"),
      when(rest === 0, lit(maxRank))
        .otherwise(lit(maxRank) - length(bin(rest))).as("rho"))
  }

  /** Scala replica of `hllFromRegisters`' estimate chain for ONE
    * register array (index = bucket, 0 = empty, else the max rho) —
    * used by the streaming operator, whose state is exactly this array.
    * Deliberately the same operation order: raw harmonic `round(num/s)`
    * (HALF_UP == `math.round` for positives), then the linear-counting
    * switch at raw <= 5m/2 with the 1-indexed table. */
  def hllEstimateFromRegisters(regs: Array[Int], p: Int = 9): Long = {
    val m = 1 << p
    val maxRank = 60 - p + 1
    val pow2Max = 1L << maxRank
    var nb = 0
    var sp = 0L
    regs.foreach { mr =>
      if (mr > 0) { nb += 1; sp += 1L << (maxRank - mr) }
    }
    val v = m - nb
    val s = v.toLong * pow2Max + sp
    val raw = math.round(hllNum(p) / s.toDouble)
    if (v > 0 && raw <= 5L * m / 2) hllLcTable(p)(v - 1) else raw
  }

  /** Merge register tables (union → max per (group, bucket)) — the
    * exact single-pass-equivalent combination; see `hllRegisters`. */
  def hllMergeRegisters(regTables: Seq[DataFrame]): DataFrame =
    regTables.reduce(_ unionByName _)
      .groupBy(col("grp"), col("bkt")).agg(max(col("mr")).as("mr"))

  /** The estimate read off a register table — the same raw-harmonic /
    * linear-counting switch as `hllDistinct` (which is literally
    * `hllFromRegisters(hllRegisters(...))`). */
  def hllFromRegisters(regs: DataFrame, p: Int = 9): DataFrame = {
    val m = 1 << p
    val maxRank = 60 - p + 1
    val pow2Max = 1L << maxRank
    val num = hllNum(p)
    val lcTable = hllLcTable(p)
    regs.groupBy(col("grp"))
      .agg(count(lit(1)).as("nb"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $maxRank - mr)")).as("sp"))
      .select(col("grp"), (lit(m.toLong) - col("nb")).as("v"),
        ((lit(m.toLong) - col("nb")) * lit(pow2Max) + col("sp")).as("s"))
      .select(col("grp"), col("v"),
        round(lit(num) / col("s").cast("double"), 0).cast("long")
          .as("raw"))
      .select(col("grp"),
        when(col("v") > 0 && col("raw") <= lit(5L * m / 2),
          element_at(lit(lcTable.toArray), col("v").cast("int")))
          .otherwise(col("raw")).as("est_distinct"))
  }

  /** One-shot HLL distinct estimate per group: `(grp, est_distinct)`.
    * ~1.04/√2^p relative error (≈4.6% at p=9), fixed 2^p register state
    * per group at ANY corpus size. */
  def hllDistinct(df: DataFrame, group: Column, item: Column,
                  p: Int = 9): DataFrame =
    hllFromRegisters(hllRegisters(df, group, item, p), p)

  /** The d per-row column addresses of an item, from ONE md5 digest:
    * row r reads hex digits [8r+1, 8r+8] — four disjoint 32-bit salted
    * hashes from a single digest computation. One md5 per item
    * OCCURRENCE instead of d was the dominant cost of the corpus-scale
    * update pass (measured 1.36× on profile_cm_heavy); disjoint digest
    * chunks are the standard multi-hash derivation and remain fully
    * engine-portable. Requires d ≤ 4 (32 hex digits / 8). */
  private def cmAddrs(item: Column, d: Int, w: Int): Column = {
    require(d <= 4, "cmAddrs splits one md5 into at most 4 chunks")
    val dg = md5(item)
    transform(sequence(lit(0), lit(d - 1)), r =>
      struct(r.as("r"),
        pmod(conv(dg.substr(r * 8 + 1, lit(8)), 16, 10).cast("long"),
          lit(w)).as("c")))
  }

  /** Count-min sketch cells over weighted items: d independent rows,
    * each hashing the item to one of w columns (disjoint chunks of one
    * md5 — see `cmAddrs`); cell = Σ weight. Grid size d·w is FIXED —
    * the whole sketch of a 100 TB corpus is d·w longs. Overestimate-
    * only by construction (collisions add, never subtract). */
  def cmCells(df: DataFrame, item: Column, weight: Column,
              d: Int = 4, w: Int = 1024): DataFrame =
    df.select(item.as("it"), weight.as("wt"))
      .select(col("wt"), explode(cmAddrs(col("it"), d, w)).as("rc"))
      .select(col("rc.r").as("r"), col("rc.c").as("c"), col("wt"))
      .groupBy(col("r"), col("c"))
      .agg(sum(col("wt")).cast("long").as("cell"))

  /** Merge count-min cell tables: union → SUM per (r, c) — the sketch
    * is linear in its input, so cells built over DISJOINT slices add to
    * exactly the single-pass cells (per-day/per-shard sketches persist
    * once and answer any disjoint-slice combination). Unlike the HLL
    * register max, summation is NOT idempotent: overlapping slices
    * double-count their shared mass, so the slicing must partition the
    * data (the HLL/CM pair brackets the two mergeability disciplines). */
  def cmMergeCells(cellTables: Seq[DataFrame]): DataFrame =
    cellTables.reduce(_ unionByName _)
      .groupBy(col("r"), col("c"))
      .agg(sum(col("cell")).cast("long").as("cell"))

  /** Point estimates from count-min cells: est(item) = min over rows of
    * the addressed cell — joins the query items against the d·w-cell
    * sketch (broadcast; the sketch is tiny by construction). */
  /** Exact per-group quantiles over a DISCRETE value column (integer or
    * already-quantized), from a grouped histogram instead of a per-group
    * value collection: count per (group, value) — a partial-aggregatable
    * hash aggregate whose state is bounded by |distinct values| per
    * group, not row count — then ONE window over the distinct values for
    * the cumulative ranks, and each requested quantile as the type-1
    * (lower-rank) order statistic `value at rank ceil(q·n)`, i.e. the
    * smallest value whose cumulative count reaches `(n·num + den − 1)
    * div den`. Pure integer rank arithmetic end to end — no engine
    * percentile/quantile built-in, no interpolation, nothing float — so
    * an oracle replays it bit-for-bit, and the window input stays
    * vocabulary-bounded at any corpus size (the same quantization
    * argument as `Clustering.medianByGroup`, without even the midpoint
    * average since type-1 returns an OBSERVED value).
    *
    * `qs` are (label, num, den) fractions, default the profiling
    * quartet p25/p50/p75/p95. Output: (group, n, <one long per q>). */
  def quantileProfile(df: DataFrame, group: Column, v: Column,
                      qs: Seq[(String, Int, Int)] = Seq(
                        ("p25", 1, 4), ("p50", 1, 2),
                        ("p75", 3, 4), ("p95", 19, 20))): DataFrame = {
    val h = df.groupBy(group.as("g"), v.as("v"))
      .agg(count(lit(1)).as("cnt"))
    val w = h
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("g")).orderBy(col("v"))))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("g"))))
    val picks = qs.map { case (label, num, den) =>
      min(when(col("cum") >= expr(s"(n * ${num}L + ${den - 1}L) div ${den}L"),
        col("v"))).as(label)
    }
    w.groupBy(col("g"))
      .agg(min(col("n")).as("n"), picks: _*)
  }

  def cmEstimate(cells: DataFrame, items: DataFrame, item: Column,
                 d: Int = 4, w: Int = 1024): DataFrame =
    items.select(item.as("it"))
      .select(col("it"), explode(cmAddrs(col("it"), d, w)).as("rc"))
      .select(col("it"), col("rc.r").as("r"), col("rc.c").as("c"))
      .join(broadcast(cells), Seq("r", "c"))
      .groupBy(col("it"))
      .agg(min(col("cell")).cast("long").as("est"))

  /** Per-GROUP CM cells — the SummaryRewrite CM summary kind's builder:
    * one d×w grid per dims tuple, (dims…, r, c, cell). Because dims
    * PARTITION the rows, cells at any coarser grain are the SUM of the
    * finer grids (CM is linear) and equal a direct build at that grain
    * exactly — one per-(day, source) cell table answers heavy-hitter
    * estimates for every rollup of its dims. The linear-sum twin of the
    * HLL register summary's idempotent max. */
  def cmCellsBy(df: DataFrame, dims: Seq[String], item: Column,
                weight: Column, d: Int = 4, w: Int = 1024): DataFrame =
    df.select((dims.map(col) :+ item.as("it") :+ weight.as("wt")): _*)
      .select((dims.map(col) :+ col("wt") :+
        explode(cmAddrs(col("it"), d, w)).as("rc")): _*)
      .select((dims.map(col) :+ col("rc.r").as("r") :+
        col("rc.c").as("c") :+ col("wt")): _*)
      .groupBy((dims.map(col) :+ col("r") :+ col("c")): _*)
      .agg(sum(col("wt")).cast("long").as("cell"))

  /** Point estimates from a per-group cell table at `dims` grain — any
    * SUBSET of the build dims (cells re-fold by sum, exact by
    * linearity; `dims = Nil` serves the global rollup). `items` carries
    * (dims…, item) query rows; est = min over the d addressed cells,
    * overestimate-only as always. The folded sketch is
    * |dim-combination|·d·w longs — broadcast-sized by construction. */
  def cmEstimateBy(cells: DataFrame, dims: Seq[String], items: DataFrame,
                   item: Column, d: Int = 4, w: Int = 1024): DataFrame = {
    val folded = cells.groupBy((dims.map(col) :+ col("r") :+ col("c")): _*)
      .agg(sum(col("cell")).cast("long").as("cell"))
    items.select((dims.map(col) :+ item.as("it")): _*)
      .select((dims.map(col) :+ col("it") :+
        explode(cmAddrs(col("it"), d, w)).as("rc")): _*)
      .select((dims.map(col) :+ col("it") :+ col("rc.r").as("r") :+
        col("rc.c").as("c")): _*)
      .join(broadcast(folded), dims ++ Seq("r", "c"))
      .groupBy((dims.map(col) :+ col("it")): _*)
      .agg(min(col("cell")).cast("long").as("est"))
  }
}
