package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.
  *
  * Scale design: every variant avoids the naive O(n²) cross join at 100 TB —
  * exact dedup is a hash aggregate; Jaccard/MinHash candidates come from
  * equi-joins on shingle/band keys (shuffle on key, broadcast-free);
  * SimHash candidates come from pigeonhole chunk buckets. Only the final
  * verification runs on the (small) candidate set.
  */
object Dedup {

  /** Exact dedup: keep the lowest id per identical key. Pure hash
    * aggregate — one shuffle on the dedup key, map-side partial min. */
  def exact(df: DataFrame, id: Column, key: Column): DataFrame =
    df.groupBy(key.as("_key"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("dup_count"))
      .drop("_key")

  // Persisted via Caches (long-lived sessions call Caches.clear() between
  // runs): the table branches into candidate generation AND verification —
  // without persist the shingle computation re-runs per branch of the DAG.
  private def shingleTable(docs: DataFrame, id: Column, text: Column,
                           n: Int): DataFrame =
    Caches.persist(
      docs.select(id.as("doc_id"), TextAnalysis.shingles(text, n).as("sh"))
        .filter(size(col("sh")) > 0)
        .withColumn("n_sh", size(col("sh"))))

  /** Exact-Jaccard verification of a light candidate pair set: join the
    * shingle arrays back only for candidates, compute
    * |A∩B| / (|A|+|B|-|A∩B|). The jaccard double is a ratio of exact ints,
    * so it is bit-identical across engines — threshold compare is
    * deterministic. The two sides may be the same shingle table (self
    * near-dup pairs) or different ones (increment vs history). */
  private def verifyJaccardAcross(cand: DataFrame, aSh: DataFrame,
                                  bSh: DataFrame, threshold: Double,
                                  aName: String, bName: String): DataFrame = {
    val a = aSh.select(col("doc_id").as(aName), col("sh").as("a_sh"),
      col("n_sh").as("a_n"))
    val b = bSh.select(col("doc_id").as(bName), col("sh").as("b_sh"),
      col("n_sh").as("b_n"))
    cand.join(a, Seq(aName)).join(b, Seq(bName))
      .withColumn("common", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("jaccard",
        col("common") / (col("a_n") + col("b_n") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col(aName), col(bName), round(col("jaccard"), 6).as("jaccard"))
  }

  private def verifyJaccard(cand: DataFrame, sh: DataFrame,
                            threshold: Double): DataFrame =
    verifyJaccardAcross(cand, sh, sh, threshold, "a_id", "b_id")

  /** Pairs `(a_id, b_id, jaccard)` with n-gram-shingle Jaccard >= threshold:
    * the exhaustive-exact baseline. Explode distinct shingles, self
    * equi-join on shingle, and count matches per pair — the count IS
    * |A∩B|, so no per-pair array intersection is ever materialized
    * (measured 4× cheaper than candidate-then-array_intersect at sf0.1).
    * Two shuffles: the shingle join and the pair aggregate.
    *
    * Scale note: inherently quadratic in docs sharing hot shingles — this
    * is the small/medium-corpus or within-bucket exact baseline. At 100 TB
    * use `minhashLshPairs`, which generates candidates from LSH buckets
    * instead of raw shingle collisions. */
  def jaccardPairs(docs: DataFrame, id: Column, text: Column, n: Int,
                   threshold: Double): DataFrame =
    shinglePairCounts(shingleTable(docs, id, text, n))
      .withColumn("jaccard",
        col("common") / (col("a_n") + col("b_n") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))

  /** Exhaustive candidate-pair counts shared by `jaccardPairs` and
    * `containmentPairs`: `(a_id, b_id, a_n, b_n, common)` for every
    * a_id < b_id sharing a shingle.
    *
    * Joins on the 64-bit hash of the shingle, not the string: the
    * self-join shuffle carries 8 bytes per shingle instead of the
    * ~n-word text, and the sort/join compares longs. Shingles are
    * distinct per doc, so |A∩B| is exact up to 64-bit collisions
    * (~|S|²/2^64 across the whole corpus — immaterial against the
    * exhaustive-string oracle at any tested SF, and vanishing relative
    * to LSH error at 100 TB).
    *
    * On NATURAL text, pre-filtering to df>=2 shingles (singletons cannot
    * contribute a pair) cuts the self-join input by the singleton mass —
    * worth one count aggregate when most shingles are unique. Measured
    * on THIS corpus it is a net loss (99.9% of occurrences recur), so
    * the join takes the full table; flip the filter in if your corpus's
    * shingle df distribution is Zipf-like with a long singleton tail.
    *
    * SHUFFLE_HASH: build a per-partition map instead of sort-merge — the
    * exploded table is uniform (hash keys) and per-partition builds are
    * |shingles|/numPartitions rows, so the two large sorts SMJ would
    * run disappear. */
  private def shinglePairCounts(sh: DataFrame): DataFrame = {
    val ex = sh.select(col("doc_id"), col("n_sh"),
      explode(col("sh")).as("shingle_s"))
      .select(col("doc_id"), col("n_sh"),
        xxhash64(col("shingle_s")).as("shingle"))
    val l = ex.select(col("doc_id").as("a_id"), col("n_sh").as("a_n"),
      col("shingle"))
    val r = ex.select(col("doc_id").as("b_id"), col("n_sh").as("b_n"),
      col("shingle"))
    l.join(r.hint("SHUFFLE_HASH"), Seq("shingle"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(first(col("a_n")).as("a_n"), first(col("b_n")).as("b_n"),
        count(lit(1)).as("common"))
  }

  /** `jaccardPairs` behind PREFIX FILTERING — the 100 TB exact-threshold
    * Jaccard path (Chaudhuri et al., ICDE 2006; Xiao et al., WWW 2008).
    * Same output as the exhaustive operator (the registered query shares
    * its oracle), but candidates come from a join on each document's
    * RAREST tokens only.
    *
    * Why it scales where the exhaustive join cannot: order all shingle
    * hashes by ascending document frequency (ties by hash — one global
    * total order), and let each document emit only its first
    * p = |x| − ⌈t·|x|⌉ + 1 tokens in that order. If J(A,B) ≥ t the
    * intersection holds ≥ ⌈t·|x|⌉ tokens of each side, which cannot all
    * hide in a suffix of size ⌈t·|x|⌉ − 1, so the two prefixes must share
    * a token (the prefix-filter lemma; the ⌈t·|x|⌉ bound is valid because
    * a qualifying partner has ≥ t·|x| tokens, making the overlap bound
    * t/(1+t)·(|A|+|B|) ≥ t·|x|). The join therefore runs on the df-SMALL
    * tail of the vocabulary: stopword-grade shingles with huge fan-out
    * sit at the END of every ordering and never enter a prefix, which is
    * exactly the hot-key mass that makes the exhaustive self-join
    * quadratic on a real crawl. No token may be dropped outright (a df
    * cap would lose pairs — this operator is exact), but fan-out per
    * surviving token is its df, and prefix tokens are the rarest by
    * construction.
    *
    * A symmetric length filter (t·|A| ≤ |B| ∧ t·|B| ≤ |A|) prunes
    * candidates before dedup; the exact verify then intersects SORTED
    * 64-bit shingle hashes (linear merge, no hash-set build) — identical
    * arithmetic to `jaccardPairs`, so surviving values are bit-identical.
    * Three shuffles beyond the exhaustive operator's two (df aggregate,
    * df join, per-doc rank window), each linear in corpus tokens. */
  /** A decimal threshold as the exact rational (num, den) of its
    * shortest decimal rendering: 0.07 → (7, 100). Requires ≤ 9
    * fractional digits (a longer decimal would overflow n·num in the
    * int64 ceiling long before n does; no such threshold is meaningful
    * for a similarity cutoff). */
  private[graft] def thresholdRational(t: Double): (Long, Long) = {
    // stripTrailingZeros: 1.0E-9 renders with scale 10 (unscaled 10) —
    // normalize to the canonical (1, 10^9) before the scale check
    val bd = BigDecimal(new java.math.BigDecimal(t.toString)
      .stripTrailingZeros())
    require(bd.scale <= 9,
      s"threshold must be a <=9-fractional-digit decimal: $t")
    val den = BigDecimal(10).pow(math.max(bd.scale, 0)).toLongExact
    ((bd * den).toLongExact, den)
  }

  /** ⌈n · num/den⌉ over a non-negative integral column, exactly:
    * (n·num + den − 1) div den in pure int64 (`div` = IntegralDivide —
    * a float `/` would lose low bits once n·num exceeds 2^53). */
  private[graft] def ceilMulExact(nCol: Column, num: Long,
                                      den: Long): Column =
    call_function("div",
      nCol.cast("long") * lit(num) + lit(den - 1L), lit(den))

  def jaccardPairsPrefix(docs: DataFrame, id: Column, text: Column, n: Int,
                         threshold: Double): DataFrame = {
    // ⌈t·n⌉ in IEEE doubles overshoots when t·n is integral in the reals
    // but rounds up in floating point (t=0.07, n=100 → 7.000…001 →
    // ceil 8), which would shorten the prefix / over-tighten the length
    // filter and silently drop qualifying pairs — breaking the exactness
    // contract. Thresholds are DECIMALS, so the ceiling is computed in
    // exact integer arithmetic (`ceilMulExact`) — no float product, no
    // epsilon, exact at every (n, t).
    val (tNum, tDen) = thresholdRational(threshold)
    def ceilT(nCol: Column): Column = ceilMulExact(nCol, tNum, tDen)
    // The §2.5 parallelism floor was TRIED here in round 17 (the shingle
    // projection materializes single-task — profiled 1.5 s serial on a
    // 32-core session) and measured SLOWER on the consumers (isolated
    // A/B: dedup_jaccard_prefix 1.30x, sample_split_leakfree 1.23x,
    // pipeline_dedup_split 1.09x): the widened cache layout puts
    // near-empty tasks into every downstream model-scale stage, same as
    // round 16's shingleTable finding. Reverted — the single-task head
    // is bounded by one scan split and disappears at production input
    // sizes anyway.
    val sh = shingleTable(docs, id, text, n)
    val tok = sh.select(col("doc_id"), col("n_sh"),
        explode(col("sh")).as("s"))
      .select(col("doc_id"), col("n_sh"), xxhash64(col("s")).as("h"))
    // shingles are distinct per doc, so count(*) per hash IS document
    // frequency
    val dfreq = tok.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy(col("doc_id"))
      .orderBy(col("df"), col("h"))
    val pref = tok.join(dfreq.hint("SHUFFLE_HASH"), Seq("h"))
      .withColumn("rn", row_number().over(byRarity))
      .filter(col("rn") <= col("n_sh") - ceilT(col("n_sh")) + 1)
      .select(col("doc_id"), col("n_sh"), col("h"))
    val l = pref.select(col("doc_id").as("a_id"), col("n_sh").as("a_n"),
      col("h"))
    val r = pref.select(col("doc_id").as("b_id"), col("n_sh").as("b_n"),
      col("h"))
    val cand = l.join(r.hint("SHUFFLE_HASH"), Seq("h"))
      .filter(col("a_id") < col("b_id") &&
        col("a_n") >= ceilT(col("b_n")) &&
        col("b_n") >= ceilT(col("a_n")))
      .select(col("a_id"), col("b_id"))
      .dropDuplicates("a_id", "b_id")
    val hs = sh.select(col("doc_id"),
      array_sort(transform(col("sh"), s => xxhash64(s))).as("hs"),
      col("n_sh"))
    val a = hs.select(col("doc_id").as("a_id"), col("hs").as("a_hs"),
      col("n_sh").as("a_n"))
    val b = hs.select(col("doc_id").as("b_id"), col("hs").as("b_hs"),
      col("n_sh").as("b_n"))
    cand.join(a, Seq("a_id")).join(b, Seq("b_id"))
      .withColumn("common", graft.functions.HashExpressions
        .sortedLongIntersectCount(col("a_hs"), col("b_hs")))
      .withColumn("jaccard",
        col("common") / (col("a_n") + col("b_n") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** Asymmetric containment pairs `(sub_id, super_id, containment)`
    * with |sub ∩ super| / |sub| >= threshold — the companion to Jaccard
    * for EMBEDDED duplication (Lee et al.'s motivating case: a short
    * document living inside a longer one, where symmetric Jaccard stays
    * low because the union is dominated by the superset). Identical
    * shingle-hash equi-join + pair aggregate to `jaccardPairs`; one
    * extra projection emits both directions of each pair before the
    * threshold filter. The ratio is exact-int / exact-int, so the
    * threshold compare is engine-portable. Same scale contract as
    * `jaccardPairs`: the exact baseline. At 100 TB do NOT block with
    * MinHash-LSH — its collision probability is calibrated to JACCARD,
    * and the embedded pairs containment exists for have low Jaccard by
    * construction (the superset dominates the union), so exactly the
    * target pairs would be missed. Block with `winnowFingerprints`
    * instead: winnowing guarantees any shared >= window+n-1-token
    * substring contributes a common fingerprint, which is
    * containment's signal — join fingerprint sets for candidates, then
    * verify here. */
  def containmentPairs(docs: DataFrame, id: Column, text: Column, n: Int,
                       threshold: Double): DataFrame =
    // both directions emit from ONE pass over the pair aggregate (an
    // exploded two-struct array) — a union of two references would plan
    // and run the quadratic pair subtree once per arm
    shinglePairCounts(shingleTable(docs, id, text, n))
      .select(explode(array(
        struct(col("a_id").as("sub_id"), col("b_id").as("super_id"),
          (col("common") / col("a_n")).as("containment")),
        struct(col("b_id").as("sub_id"), col("a_id").as("super_id"),
          (col("common") / col("b_n")).as("containment")))).as("e"))
      .select(col("e.sub_id").as("sub_id"),
        col("e.super_id").as("super_id"),
        col("e.containment").as("containment"))
      .filter(col("containment") >= threshold)
      .select(col("sub_id"), col("super_id"),
        round(col("containment"), 6).as("containment"))

  /** `containmentPairs` behind WINNOWING-FINGERPRINT blocking — the 100 TB
    * containment path the `containmentPairs` doc prescribes. Candidate
    * pairs come from an equi-join on winnowing fingerprints
    * (`winnowFingerprintSets`' selection core), then the exact containment
    * ratio is verified from the shingle sets for candidates ONLY.
    *
    * Why winnowing and not MinHash-LSH: LSH collision probability is
    * calibrated to symmetric JACCARD, and embedded pairs have low Jaccard
    * by construction (the superset dominates the union) — LSH would miss
    * exactly the target pairs. Winnowing's guarantee is substring-shaped,
    * which is containment's signal: any shared run of >= `window + n - 1`
    * tokens contributes a common fingerprint (Schleimer et al., SIGMOD
    * 2003). A sub-document embedded contiguously in a super-document
    * shares runs far longer than that, so recall on embedded duplication
    * is structural, not probabilistic. (A pair sharing >= threshold of
    * scattered SINGLE shingles with no >= window+n-1-token common run can
    * evade the block — that shape is not embedded duplication, and the
    * oracle replays the blocked semantics exactly.)
    *
    * Scale: the fingerprint join shuffles ~1/window of the gram hashes
    * (8-byte keys) instead of every shingle — candidates are pairs that
    * share a SELECTED minimum, a small superset of the true embedded
    * pairs; the verify join fetches shingle arrays only for those. No
    * all-pairs shingle self-join anywhere on the path.
    *
    * `maxDf` caps fingerprint document frequency before the candidate
    * self-join: a fingerprint appearing in D documents yields D²/2
    * candidate rows, and real crawls have boilerplate grams whose D is
    * unbounded — the cap bounds the join's per-key fan-out at maxDf²
    * regardless of corpus size (the standard blocking-key cap). Recall
    * survives because winnowing selects ~n_grams/window fingerprints per
    * doc: an embedded run of L tokens contributes ~L/window of them, and
    * the pair is missed only if EVERY one is corpus-hot — i.e. the
    * shared text is itself boilerplate, which is exactly the duplication
    * one does not need containment to find (`DedupSpec` pins this with a
    * planted pair under a binding cap).
    *
    * Verify-stage shape, MEASURED at sf0.1 (334k candidates, warm
    * medians): per-candidate `array_intersect` 3.9 s beats the narrow
    * exploded re-join of a-side shingles to b-side (5.3 s — it shuffles
    * |sh(a)| 24-byte rows per pair where the array row carries the same
    * elements contiguously in ~8 bytes each), and the
    * full-self-join-then-semi-filter alternative (3.3 s here) is
    * corpus-quadratic — the exact bomb blocking exists to avoid — so
    * per-candidate arrays it is: verify cost stays ∝ |cand| × doc size.
    *
    * Blocking SELECTIVITY is data-dependent: the driver's synthetic
    * corpus draws from a tiny vocabulary, so 27% of ALL pairs share a
    * shingle, candidates are only 3× fewer than sharing pairs, and the
    * exact operator's narrow self-join (0.7 s warm at sf0.1) beats any
    * scheme that pays winnowing's linear preprocessing (1.8 s) first —
    * blocked wins where it matters instead: on Zipf-vocabulary corpora
    * at larger scale, where exact's Σ df² join explodes on hot grams
    * and the cap holds candidates near the true pairs (the
    * `blocked_crossover` bench diagnostic measures exactly that). */
  def containmentPairsBlocked(docs: DataFrame, id: Column, text: Column,
                              n: Int, threshold: Double,
                              window: Int = 4,
                              maxDf: Int = 64): DataFrame = {
    // persisted: branches into the df-cap aggregate AND both join sides
    // (unpersisted, the winnowing windows would run once per branch)
    val fps = Caches.persist(
      winnowSelect(docs, id, text, Nil, n, window)
        .dropDuplicates("doc_id", "fp"))
    val hot = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(col("fp"))
    // anti-join, not a df-column filter-join: the hot set is tiny (it is
    // the distribution's tail above the cap), so AQE broadcasts it and
    // the corpus side pays no exchange
    val capped = fps.join(hot, Seq("fp"), "left_anti")
    val l = capped.select(col("doc_id").as("a_id"), col("fp"))
    val r = capped.select(col("doc_id").as("b_id"), col("fp"))
    // fingerprint buckets are hash-uniform → per-partition hash builds
    val cand = l.join(r.hint("SHUFFLE_HASH"), Seq("fp"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")
    // verify on SORTED 64-bit shingle hashes, not string arrays: the
    // per-pair intersection becomes a linear long-merge
    // (SortedLongIntersectCount — no per-row hash-set build, ~8-byte
    // elements instead of gram strings), counting exactly what the exact
    // operator's xxhash64 equi-join counts, with the identical
    // ~|S|²/2^64 collision caveat
    val sh = shingleTable(docs, id, text, n).select(col("doc_id"),
      array_sort(transform(col("sh"), s => xxhash64(s))).as("hs"),
      col("n_sh"))
    val a = sh.select(col("doc_id").as("a_id"), col("hs").as("a_hs"),
      col("n_sh").as("a_n"))
    val b = sh.select(col("doc_id").as("b_id"), col("hs").as("b_hs"),
      col("n_sh").as("b_n"))
    // same one-pass two-direction emit as containmentPairs; `common` is
    // the distinct-shingle intersection, so values are bit-identical to
    // the exact operator's on every surviving pair
    cand.join(a, Seq("a_id")).join(b, Seq("b_id"))
      .withColumn("common", graft.functions.HashExpressions
        .sortedLongIntersectCount(col("a_hs"), col("b_hs")))
      .select(explode(array(
        struct(col("a_id").as("sub_id"), col("b_id").as("super_id"),
          (col("common") / col("a_n")).as("containment")),
        struct(col("b_id").as("sub_id"), col("a_id").as("super_id"),
          (col("common") / col("b_n")).as("containment")))).as("e"))
      .select(col("e.sub_id").as("sub_id"),
        col("e.super_id").as("super_id"),
        col("e.containment").as("containment"))
      .filter(col("containment") >= threshold)
      .select(col("sub_id"), col("super_id"),
        round(col("containment"), 6).as("containment"))
  }

  /** MinHash signature columns. Universal-hash family over a 64-bit base
    * hash: h_i(s) = (a_i * xxhash64(s) + b_i) mod p, fully deterministic
    * (fixed xxhash64 seed 42, arithmetic a_i/b_i derived from i). */
  /** MinHash + LSH near-dup pairs: k=`numHashes` minhashes split into
    * `bands` bands; docs sharing any band bucket become candidates; exact
    * shingle-Jaccard verifies candidates >= threshold. With the default
    * k=32, b=16 (r=2), P[miss | j=0.7] ≈ 2e-5 per pair.
    *
    * Scale: candidate generation is an equi-join on (band, bucket-hash) —
    * shuffle by bucket, no cross join; the verify join re-joins shingle sets
    * only for candidate pairs. */
  def minhashLshPairs(docs: DataFrame, id: Column, text: Column,
                      n: Int = 3, numHashes: Int = 32, bands: Int = 16,
                      threshold: Double = 0.7): DataFrame = {
    val sh = shingleTable(docs, id, text, n)
    // native single-pass signature (graft.functions.MinHashSignature) —
    // the universal family mod 2^31-1 wraps genuinely, so each h_i is an
    // independent permutation (a non-wrapping family degenerates to a
    // single-hash MinHash and loses recall). Band key = (bandIndex, hash
    // of the band's signature slice); the candidate join carries only
    // (doc_id, band, bucket) — shingle arrays are fetched back just for
    // the (few) candidates.
    val banded = bandedBuckets(sh, numHashes, bands)
    val l = banded.select(col("doc_id").as("a_id"), col("band"), col("bucket"))
    val r = banded.select(col("doc_id").as("b_id"), col("band"), col("bucket"))
    // hash join: band buckets are hash-uniform, per-partition builds tiny
    val cand = l.join(r.hint("SHUFFLE_HASH"), Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")
    verifyJaccard(cand, sh, threshold)
  }

  /** SimHash over lowercased tokens: per bit, sum +1/-1 across tokens, bit
    * set where the sum is positive. Native single-pass expression
    * (graft.functions.SimHash64) — no explode, no shuffle. Default base hash
    * is the md5-derived 60-bit value (engine-portable, DuckDB-oracle-checked);
    * `md5Base = false` switches to 64-bit xxhash64. */
  def simhash(text: Column, md5Base: Boolean = true): Column =
    graft.functions.HashExpressions.simhash64(
      TextAnalysis.tokens(lower(text)), md5Base)

  /** SimHash near-dup pairs with Hamming distance <= maxDist. Candidate
    * generation by pigeonhole: split the hash into `maxDist+1` chunks — any
    * pair within maxDist agrees on at least one chunk, so an equi-join on
    * (chunkIndex, chunkValue) finds all candidates without a cross join. */
  def simhashPairs(docs: DataFrame, id: Column, text: Column,
                   maxDist: Int = 3, md5Base: Boolean = true): DataFrame = {
    val chunks = maxDist + 1
    val bitsPer = (if (md5Base) 60 else 64) / chunks
    val h = docs.select(id.as("doc_id"), simhash(text, md5Base).as("sh"))
    val chunked = h.select(col("doc_id"), col("sh"),
      posexplode(array((0 until chunks).map(c =>
        shiftright(col("sh"), c * bitsPer)
          .bitwiseAND((1L << bitsPer) - 1)): _*)).as(Seq("chunk", "v")))
    val l = chunked.select(col("doc_id").as("a_id"), col("sh").as("a_sh"),
      col("chunk"), col("v"))
    val r = chunked.select(col("doc_id").as("b_id"), col("sh").as("b_sh"),
      col("chunk"), col("v"))
    l.join(r.hint("SHUFFLE_HASH"), Seq("chunk", "v"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sh").bitwiseXOR(col("b_sh"))).cast("long")
          .as("hamming"))
      .dropDuplicates("a_id", "b_id")
      .filter(col("hamming") <= maxDist)
  }

  /** Embedding-cosine near-dup pairs: SRP-LSH banded candidates + exact
    * cosine verification (Similarity.srpLshPairs) — bucketed equi-join,
    * never an all-pairs cross join. */
  def embeddingNearDups(emb: DataFrame, id: Column, vec: Column,
                        threshold: Double): DataFrame =
    Similarity.srpLshPairs(emb, id, vec, threshold)

  /** Incremental embedding near-dup filter: which `incoming` vectors are
    * near-duplicates of the already-clean `history` — `nearDupAgainst`'s
    * embedding counterpart (SRP band buckets joined increment-vs-history,
    * exact-cosine verify; see Similarity.srpLshPairsAgainst). */
  def embeddingNearDupsAgainst(history: DataFrame, incoming: DataFrame,
                               id: Column, vec: Column,
                               threshold: Double): DataFrame =
    Similarity.srpLshPairsAgainst(history, incoming, id, vec, threshold)

  /** MinHash band buckets for a shingle table: one row per (doc, band)
    * with the band's bucket hash — the shared candidate-generation key for
    * within-corpus pairs (`minhashLshPairs`) and incremental
    * (`nearDupAgainst`) dedup. */
  /** The LSH CANDIDATE pair set, pre-verification — what the banding
    * alone nominates. `minhashLshPairs` verifies candidates with exact
    * Jaccard, so its output can't measure the banding's own
    * precision/recall; this exposes the raw candidates for the
    * eval_lsh_quality row. With `md5Base=true` the signature family is
    * the engine-portable md5 one and the band key is the RAW signature
    * slice (rendered as a string, injective), so a DuckDB oracle
    * replays the exact candidate set — no bucket-hash collision can
    * add a pair the replay lacks. Same banded equi-join shape as the
    * production path: never an all-pairs comparison. */
  def minhashLshCandidates(docs: DataFrame, id: Column, text: Column,
                           n: Int = 3, numHashes: Int = 32,
                           bands: Int = 16,
                           md5Base: Boolean = false): DataFrame = {
    val rows = numHashes / bands
    val sh = shingleTable(docs, id, text, n)
    val banded = sh
      .withColumn("sig", graft.functions.HashExpressions
        .minhashSignature(col("sh"), numHashes, md5Base))
      .select(col("doc_id"),
        posexplode(array((0 until bands).map(bnd =>
          array_join(transform(
            slice(col("sig"), bnd * rows + 1, rows),
            x => x.cast("string")), ":")): _*))
          .as(Seq("band", "bucket")))
    val l = banded.select(col("doc_id").as("a_id"), col("band"),
      col("bucket"))
    val r = banded.select(col("doc_id").as("b_id"), col("band"),
      col("bucket"))
    l.join(r.hint("SHUFFLE_HASH"), Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")
  }

  private def bandedBuckets(sh: DataFrame, numHashes: Int,
                            bands: Int): DataFrame = {
    val rows = numHashes / bands
    sh.withColumn("sig",
        graft.functions.HashExpressions.minhashSignature(col("sh"), numHashes))
      .select(col("doc_id"),
        posexplode(array((0 until bands).map(bnd =>
          hash(slice(col("sig"), bnd * rows + 1, rows))): _*))
          .as(Seq("band", "bucket")))
  }

  /** Near-dup filter for the append workflow: which `incoming` rows are
    * near-duplicates (shingle-Jaccard >= threshold) of the already-clean
    * `history` — `newAgainst`'s LSH counterpart for the 99% of real dups
    * that are not byte-identical. Returns `(new_id, dup_of, jaccard)`.
    *
    * Scale: candidates come from an equi-join of the increment's band
    * buckets against the history's — shuffle keyed by (band, bucket),
    * volume O(increment + matching history buckets), never a history
    * self-join; at 100 TB the history bucket table is precomputed once
    * and reused across daily increments. Exact Jaccard verifies only the
    * candidates. */
  def nearDupAgainst(history: DataFrame, incoming: DataFrame, id: Column,
                     text: Column, n: Int = 3, numHashes: Int = 32,
                     bands: Int = 16, threshold: Double = 0.7): DataFrame = {
    val hs = shingleTable(history, id, text, n)
    val hb = bandedBuckets(hs, numHashes, bands)
      .withColumnRenamed("doc_id", "dup_of")
    nearDupAgainstPrepped((hs, hb), incoming, id, text, n, numHashes,
      bands, threshold)
  }

  /** Wiring-time history prep for the STREAMING near-dup gates: the
    * frozen history corpus's shingle table and banded buckets, built and
    * persisted ONCE outside the stream. Without it every micro-batch
    * re-shingled and re-banded the entire history (r16 verdict #9's
    * predicted per-microbatch re-derivation — the foreachBatch twin of
    * the per-round plan rebuild the graph loops had). The frames are
    * read by every trigger; the caller owns their lifetime
    * (`Caches.clear()` releases them with everything else). */
  def nearDupHistoryPrep(history: DataFrame, id: Column, text: Column,
                         n: Int = 3, numHashes: Int = 32,
                         bands: Int = 16): (DataFrame, DataFrame) = {
    val hs = Caches.persist(shingleTable(history, id, text, n))
    val hb = Caches.persist(bandedBuckets(hs, numHashes, bands)
      .withColumnRenamed("doc_id", "dup_of"))
    (hs, hb)
  }

  /** `nearDupAgainst` with the history side pre-prepped
    * ([[nearDupHistoryPrep]]) — per call only the incoming batch pays
    * shingling/banding. Pair semantics identical to `nearDupAgainst`
    * (which now delegates here). */
  def nearDupAgainstPrepped(prep: (DataFrame, DataFrame),
                            incoming: DataFrame, id: Column, text: Column,
                            n: Int = 3, numHashes: Int = 32,
                            bands: Int = 16,
                            threshold: Double = 0.7): DataFrame = {
    val (hs, hb) = prep
    val is = shingleTable(incoming, id, text, n)
    val ib = bandedBuckets(is, numHashes, bands)
      .withColumnRenamed("doc_id", "new_id")
    val cand = ib.join(hb.hint("SHUFFLE_HASH"), Seq("band", "bucket"))
      .select("new_id", "dup_of")
      .dropDuplicates("new_id", "dup_of")
    verifyJaccardAcross(cand, is, hs, threshold, "new_id", "dup_of")
  }

  /** Incremental dedup: which of the `incoming` batch's rows are genuinely
    * new against an already-deduplicated `history` corpus — the daily
    * append workflow (dedupe the increment, not the lake). Two stages, no
    * scan of history beyond the join: (1) within-batch exact dedup keeps
    * the lowest id per key; (2) a left-anti join drops keys the history
    * already contains. At 100 TB the history side enters pre-bucketed or
    * partition-pruned by the same key; the shuffle carries the (small)
    * increment plus one row per historical key — never the corpus rows. */
  def newAgainst(history: DataFrame, incoming: DataFrame, id: Column,
                 key: Column): DataFrame = {
    val inc = incoming.select(id.as("new_id"), key.as("_key"))
      .groupBy(col("_key")).agg(min(col("new_id")).as("new_id"))
    inc.join(history.select(key.as("_key")).distinct(),
        Seq("_key"), "left_anti")
      .select(col("new_id"))
  }

  /** CCNet-style boilerplate statistics: split each doc into consecutive
    * `segTokens`-token segments, count per segment how many DISTINCT docs
    * contain it corpus-wide, and report per doc how many of its segments
    * are boilerplate (appear in >= `minDocs` docs). Downstream, a pipeline
    * drops the boilerplate segments (nav bars, cookie banners, repeated
    * headers) and keeps the rest — the standard line/paragraph-level dedup
    * pass that document-level dedup cannot express.
    *
    * Scale: segments join on their 64-bit hash, not the text — the
    * frequency aggregate and the join back both shuffle 8-byte keys, and
    * segment frequency is a map-side-partial `count(distinct)` collapsed
    * to exact by the per-(seg, doc) pre-aggregate. No driver loop, no
    * cross join; volume is O(total segments) = O(corpus tokens /
    * segTokens). */
  def boilerplateStats(docs: DataFrame, id: Column, text: Column,
                       segTokens: Int = 12, minDocs: Int = 2): DataFrame = {
    // persisted: the segment frame branches into the frequency aggregate
    // AND the join back (Caches.clear() between runs in long sessions)
    val segs = Caches.persist(
      docs.select(id.as("doc_id"),
          explode(TextAnalysis.tokenChunks(
            TextAnalysis.tokens(text), segTokens, segTokens)).as("c"))
        .select(col("doc_id"), xxhash64(col("c.chunk_text")).as("seg_h")))
    // distinct (seg, doc) first so the frequency agg is a plain count —
    // partial-aggregatable, unlike a straight count(distinct doc_id)
    val freq = segs.dropDuplicates("seg_h", "doc_id")
      .groupBy(col("seg_h"))
      .agg(count(lit(1)).as("df_docs"))
    segs.join(freq.hint("SHUFFLE_HASH"), Seq("seg_h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("df_docs") >= minDocs, 1L).otherwise(0L))
          .as("n_boilerplate"))
  }

  /** Collapse near-dup pairs into clusters: every doc labeled with the
    * smallest id in its connected component of the pair graph —
    * the step that turns pairwise dedup output into keep/drop decisions
    * (keep the representative, drop the rest).
    *
    * Min-label propagation: each round joins labels across edges and takes
    * the per-node min; converges in O(component diameter) rounds. Near-dup
    * components are near-cliques (LSH candidates share buckets), so the
    * practical round count is 2-4; `maxIters` caps pathological chains and
    * each round is two shuffles (join + aggregate) over the PAIRS, whose
    * volume is near-dup count, not corpus size.
    *
    * Each round is `localCheckpoint`ed, not persisted: `labels` is
    * referenced TWICE per round (join side + union side), so a persisted
    * plan's `InMemoryRelation` tree doubles every round — by ~round 12
    * just RENDERING the plan string for the AQE UI callback overwhelms
    * the driver heap. The checkpoint flattens the plan to a `LogicalRDD`
    * each round; superseded rounds' blocks are freed by the
    * ContextCleaner. See `dedupClustersAlternating` for the fault-
    * tolerance trade-off note.
    *
    * Output: `(doc_id, cluster_rep)` for every doc appearing in a pair. */
  def dedupClusters(pairs: DataFrame, a: Column, b: Column,
                    maxIters: Int = 25): DataFrame = {
    val half = pairs.select(a.as("src"), b.as("dst"))
    val edges = Caches.persist(
      half.union(half.select(col("dst").as("src"), col("src").as("dst")))
        .distinct())
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(false)
    val labelType = labels.schema("label").dataType
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // ONE action per round: each node's OLD label rides through the
      // propagation aggregate (max ignores the prop rows' nulls; every
      // node has exactly one labels row), so the convergence check is a
      // filter+count over the same aggregate output — no second join
      // against the previous labels and no separate job for it. The
      // count is also the round's one materializing action (the
      // checkpoint is non-eager).
      val prop = edges.join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("id"), col("label"),
          lit(null).cast(labelType).as("old"))
      val next = labels.select(col("id"), col("label"),
          col("label").as("old"))
        .union(prop)
        .groupBy("id").agg(min(col("label")).as("label"),
          max(col("old")).as("old"))
        .localCheckpoint(false)
      val changed = next.filter(col("label") =!= col("old")).count()
      labels = next.select(col("id"), col("label"))
      converged = changed == 0L
      i += 1
    }
    // exiting via maxIters means some label was still moving — the
    // output would silently mislabel every chain longer than the cap
    // (exactly the case the alternating engine exists for); fail loudly
    if (!converged) throw new IllegalStateException(
      s"dedupClusters did not converge in $maxIters rounds — labels were " +
        "still propagating; raise maxIters or use " +
        "dedupClustersAlternating (O(log n) rounds) for long chains")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_rep"))
  }

  /** Connected components by ALTERNATING large-star/small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014) — the same `(doc_id, cluster_rep = component min)`
    * contract as `dedupClusters`, converging in O(log n) rounds instead
    * of O(component diameter). Min-label propagation moves a label ONE
    * hop per round, so a transitive near-dup CHAIN (A~B~C~… with the
    * ends dissimilar — common under loose thresholds) longer than its
    * `maxIters` silently returns unconverged labels; the star operations
    * instead contract whole subtrees toward the component minimum each
    * round, so the default cap here covers astronomically large
    * components (2^20-diameter chains).
    *
    * Per round: large-star connects every node's LARGER neighbors to its
    * adjacent minimum, small-star re-points the smaller neighbors — each
    * one `groupBy`-min plus one self-equi-join over the CURRENT edge set
    * (whose volume only contracts toward the star forest, never grows
    * beyond 2|E|). Convergence = (edge count, order-independent edge-set
    * hash) fixpoint: ONE action per round. At the fixpoint the edge set
    * IS the star forest `(component min, member)`.
    *
    * Each round's result is `localCheckpoint`ed, NOT persisted: the
    * two-join-two-aggregate round plan compounds, and by ~round 8 the
    * accumulated lineage is big enough that merely RENDERING the explain
    * string for the UI overwhelms the driver (persist caches data but
    * keeps the full logical plan). The checkpoint replaces the plan with
    * a flat `LogicalRDD`; the blocks are freed by the ContextCleaner
    * when the superseded round's RDD is unreferenced. On a cluster where
    * executor loss matters, swap in reliable `checkpoint()` (same
    * truncation, HDFS-backed) — localCheckpoint trades that fault
    * tolerance for zero extra I/O, the right default for a loop whose
    * input is re-derivable near-dup pairs. */
  def dedupClustersAlternating(pairs: DataFrame, a: Column, b: Column,
                               maxIters: Int = 20): DataFrame = {
    // checkpoint BEFORE the self-loop filter: `nodes` must include docs
    // appearing only in degenerate (x, x) pairs — dedupClusters emits
    // them self-labeled, and the two engines advertise one contract —
    // and both derivations should share the one materialized base rather
    // than re-running the (expensive) candidate generator
    val base = pairs
      .select(least(a, b).as("lo"), greatest(a, b).as("hi"))
      .distinct()
      .localCheckpoint(false)
    val nodes = base.select(explode(array(col("lo"), col("hi")))
      .as("doc_id")).distinct()
    var edges = base.filter(col("lo") =!= col("hi"))
    var prevSig: (Long, Long) = (-1L, 0L)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // large-star: for each node u (both directions), m = min(u, N(u));
      // every neighbor v > u re-points to m. Output stays canonical
      // (m <= u < v). No distinct here (round 16): duplicate (m, v)
      // rows cannot change small-star's min aggregate and the round's
      // output set is deduped below, so the intermediate dedup exchange
      // was pure cost — one full exchange per round removed at any
      // scale; volume stays bounded by |adjL| = 2|E|. (A/B min-of-3:
      // 1.38 → 1.29 s on the sf0.1 near-dup graph, identical label
      // checksums; explicit partition pinning and SHUFFLE_HASH hints
      // were ALSO tried here and measured slower — this loop's state is
      // a shrinking edge list whose per-round aggregates the planner
      // already broadcasts well, unlike the Graph loops' cached-frame
      // joins.)
      val adjL = edges.select(col("lo").as("u"), col("hi").as("v"))
        .union(edges.select(col("hi").as("u"), col("lo").as("v")))
      val minsL = adjL.groupBy(col("u")).agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val ls = adjL.join(minsL, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("m").as("lo"), col("v").as("hi"))
      // small-star: for each node u, its SMALLER neighbors (plus u) all
      // re-point to their minimum mv (< u by construction).
      val adjS = ls.select(col("hi").as("u"), col("lo").as("v"))
      val minsS = adjS.groupBy(col("u")).agg(min(col("v")).as("mv"))
      val ss = adjS.join(minsS, Seq("u"))
        .filter(col("v") =!= col("mv"))
        .select(col("mv").as("lo"), col("v").as("hi"))
        .union(minsS.select(col("mv").as("lo"), col("u").as("hi")))
        .distinct()
        .localCheckpoint(false) // non-eager: the sig agg below is the
                                // round's ONE materializing action
      val sigRow = ss.agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(col("lo"), col("hi"))), lit(0L))).head
      val sig = (sigRow.getLong(0), sigRow.getLong(1))
      edges = ss
      converged = sig == prevSig
      prevSig = sig
      i += 1
    }
    // two silent-wrongness paths, both made loud: exhausting maxIters
    // returns a part-contracted edge set, and a (count, bit_xor) signature
    // collision between DIFFERENT consecutive edge sets would declare a
    // false fixpoint. The first raises; the second is caught by verifying
    // the claimed fixpoint IS a star forest — in a star forest no node is
    // a member twice or both a root and a member, and any non-fixpoint
    // edge set violates that. One edge-scale aggregate at convergence.
    if (!converged) throw new IllegalStateException(
      s"dedupClustersAlternating did not converge in $maxIters " +
        "alternating rounds — the edge set was still contracting; raise " +
        "maxIters (the default covers 2^20-diameter components)")
    val violations = edges.select(explode(array(
        struct(col("lo").as("n"), lit(0L).as("h"), lit(1L).as("l")),
        struct(col("hi").as("n"), lit(1L).as("h"), lit(0L).as("l"))))
        .as("e"))
      .groupBy(col("e.n"))
      .agg(sum(col("e.h")).as("nh"), sum(col("e.l")).as("nl"))
      .filter(col("nh") >= 2 || (col("nh") >= 1 && col("nl") >= 1))
      .count()
    if (violations != 0L) throw new IllegalStateException(
      s"dedupClustersAlternating signature collision: the converged edge " +
        s"set is not a star forest ($violations node violations) — " +
        "a (count, bit_xor) fixpoint matched two different edge sets")
    // the converged edge set is the star forest (lo = component min):
    // members read their root off the edges; roots and self-loop-only
    // docs fall through the left join and label themselves
    nodes.join(edges.select(col("hi").as("doc_id"),
        col("lo").as("rep")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("rep"), col("doc_id")).as("cluster_rep"))
  }

  /** Winnowing fingerprints (Schleimer et al., SIGMOD 2003 — the MOSS
    * algorithm): hash every word `n`-gram in document order, slide a
    * `window`-wide frame over the hash sequence, and keep each frame's
    * minimum. The selected set is position-robust: any shared substring of
    * at least `window + n - 1` tokens between two documents is GUARANTEED
    * to contribute at least one common fingerprint — the coverage guarantee
    * exact shingle sampling (`0 mod p` selection) lacks. The standard
    * substring-level contamination / clone-detection signature.
    *
    * Returns one row per doc: `(doc_id, n_fp, fp_sig)` — the distinct
    * fingerprint count and an md5 over the sorted fingerprint set (compact,
    * hash-comparable; join two corpora on exploded fingerprints for overlap
    * detection, as `text_contamination` does with raw shingles). Docs with
    * fewer than `window` n-grams emit no row (no complete frame).
    *
    * Scale: grams hash to 60-bit md5-derived longs (8-byte keys, engine-
    * portable), the frame minimum is ONE bounded-following window over ONE
    * shuffle keyed by doc — state per row is a `window`-element heap, and
    * docs are small so partitions hold many whole docs. No self-join, no
    * cross-doc work at all until a caller joins fingerprint sets. */
  def winnowFingerprints(docs: DataFrame, id: Column, text: Column,
                         n: Int = 3, window: Int = 4): DataFrame =
    winnowFingerprintSets(docs, id, text, n, window)
      .select(col("doc_id"), size(col("fps")).cast("long").as("n_fp"),
        md5(concat_ws(" ", transform(col("fps"), x => x.cast("string"))))
          .as("fp_sig"))

  /** The winnowing selection core: one row per selected frame (a (doc,
    * fp) pair may repeat when several frames pick the same minimum —
    * callers dedup inside their aggregate, which costs no extra shuffle),
    * with `carry` columns (constant per doc) riding along. Both window
    * functions — the per-doc gram count and the frame min — share ONE
    * doc-keyed shuffle. */
  private def winnowSelect(docs: DataFrame, id: Column, text: Column,
                           carry: Seq[(String, Column)], n: Int,
                           window: Int): DataFrame = {
    // native one-pass gram hashing (graft.functions.WordGramHashes):
    // values identical to conv(substring(md5(gram),1,15),16,10) over
    // TextAnalysis.ngrams, so every oracle replay is unchanged
    // parallelism floor (round 16): the one-pass gram hashing is the
    // CPU-heavy projection — keep it off a one-split scan
    val pre = Tuning.boostMapParallelism(docs.select(
      Seq(id.as("doc_id"), text.as("__t")) ++
        carry.map { case (nm, c) => c.as(nm) }: _*))
    val cols = Seq(col("doc_id")) ++ carry.map { case (nm, _) => col(nm) } :+
      posexplode(graft.functions.HashExpressions.wordGramHashes(
        lower(col("__t")), n)).as(Seq("pos", "h"))
    val grams = pre.select(cols: _*)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, window - 1)
    val nG = Window.partitionBy(col("doc_id"))
    grams
      .withColumn("fp", min(col("h")).over(w))
      .withColumn("n_grams", count(lit(1)).over(nG))
      // only complete frames select a fingerprint (frame start must have
      // window-1 grams after it) — same cut the oracle applies
      .filter(col("pos") <= col("n_grams") - window)
      .select((Seq(col("doc_id")) ++ carry.map(c => col(c._1)) :+
        col("fp")): _*)
  }

  /** The raw winnowing selection: `(doc_id, fps)` with the sorted distinct
    * fingerprint array — explode and equi-join two corpora's sets for
    * substring-overlap detection (the same join shape as
    * `text_contamination`). */
  def winnowFingerprintSets(docs: DataFrame, id: Column, text: Column,
                            n: Int = 3, window: Int = 4): DataFrame =
    winnowSelect(docs, id, text, Nil, n, window)
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_set(col("fp"))).as("fps"))

  /** Substring-level contamination via winnowing fingerprints: for every
    * non-benchmark doc, how many selected fingerprints it shares with the
    * benchmark slice (`source == benchValue`). Winnowing's coverage
    * guarantee makes this STRONGER than fixed n-gram contamination
    * (`text_contamination`): any shared run of >= window + n - 1 tokens is
    * caught, while storing only ~1/window of the gram hashes.
    *
    * Scale: the benchmark fingerprint set is tiny — it broadcasts, so the
    * corpus side pays no exchange for the join (the same shape as
    * `text_contamination`); the winnowing itself is one doc-keyed shuffle.
    */
  def winnowContamination(docs: DataFrame, id: Column, text: Column,
                          source: Column, benchValue: String,
                          n: Int = 3, window: Int = 4): DataFrame = {
    val sel = Caches.persist(winnowSelect(docs, id, text,
      Seq("src" -> source), n, window))
    val bench = sel.filter(col("src") === benchValue)
      .select(col("fp")).distinct()
    sel.filter(col("src") =!= benchValue)
      .join(broadcast(bench), Seq("fp"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("fp")).as("n_shared"))
  }

  /** Exact-substring span dedup (the ExactSubstr operation of Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better", ACL
    * 2022): drop from every document each token span of length >= `k`
    * that occurs more than once ANYWHERE in the corpus (including twice
    * in one document), keeping the rest of the document intact —
    * document-level dedup misses exactly these embedded boilerplate
    * passages. The paper builds a corpus-wide suffix array; the
    * equivalent-by-definition relational form used here: a token is
    * dropped iff some duplicated k-shingle covers it, because every
    * duplicated span of length >= k is a union of duplicated k-shingles
    * and every duplicated k-shingle IS a duplicated span.
    *
    * Scale shape (all corpus-size structures stay distributed):
    *  1. positional k-shingle table — built in the scan stage from one
    *     `transform(sequence(...))` per doc, exploded; 128-bit hash
    *     pairs (two xxhash64 lanes — a single 64-bit key reaches its
    *     birthday bound at the documented 1e10-1e11-shingle scale and a
    *     collision DELETES unique text; the pair's bound is ~1e-17),
    *     never shingle text, cross the wire;
    *  2. corpus-wide occurrence counts = one hash aggregate on the
    *     shingle hash pair, map-side partial; joined back SHUFFLE_HASH
    *     on the same 16-byte key (uniform hash keys — no skew, no sort);
    *  3. per-token coverage NEVER JOINS the duplicated-start set against
    *     the token table (that set is ~dup-fraction × corpus tokens —
    *     not broadcast-safe, and an equi-join would cost its own
    *     exchange): flag rows UNION with token rows and ONE doc-keyed
    *     window with a bounded RANGE frame `[-(k-1), 0]` over the
    *     position takes the max flag — range, not rows, so interleaved
    *     flag rows cannot shift the frame;
    *  4. cleaned-text reassembly = a doc-keyed aggregate that reuses the
    *     window's hash partitioning — no extra exchange; `collect_list`
    *     skips the nulls the covered tokens become, so only KEPT tokens
    *     are buffered.
    *
    * Output: `(doc_id, n_tokens, n_kept, clean_text)` — `clean_text` is
    * the document with every duplicated span removed (empty string when
    * nothing survives). Matching is CASE-INSENSITIVE (lowercase
    * whitespace-split shingles, the other text operators' contract);
    * kept tokens keep their original bytes, so an untouched document
    * round-trips byte-identically through split/rejoin. */
  def substringDedup(docs: DataFrame, id: Column, text: Column,
                     k: Int = 15): DataFrame = {
    val (sh, tok) = substringTables(docs, id, text, k)
    val occ = sh.groupBy(col("h1"), col("h2")).agg(count(lit(1)).as("c"))
    val dupStarts = sh.join(occ.hint("SHUFFLE_HASH"), Seq("h1", "h2"))
      .filter(col("c") >= 2)
      .select(col("doc_id"), col("s").as("p"),
        lit(null).cast("string").as("tok"), lit(1).as("dup"))
    substringAssemble(tok, dupStarts, k)
  }

  /** `newAgainst` behind a BLOOM-FILTER prefilter — identical answer
    * (the filter is an optimization, verified exactly), different scale
    * economics: the history key set is folded into one bloom sketch by a
    * distributed aggregate (partial sketches merge map-side; only sketch
    * BYTES shuffle), the sketch broadcasts once, and then only the
    * `might_contain` POSITIVES — true duplicates plus an `fpp` fraction
    * of the genuinely-new keys — pay the anti-join shuffle against
    * history. For mostly-novel batches (the common ingest case) that
    * removes almost the entire history-side join.
    *
    * Size the regime consciously: the sketch is ~1.2·n·|ln fpp| bits —
    * 100M history keys at 3% ≈ 90 MB, about the practical ceiling, and
    * regimes past the session's `runtime.bloomFilter.maxNumItems/
    * maxNumBits` confs (defaults 4M/8MB) require RAISING those confs:
    * `bloomBits` refuses configurations the aggregate would silently
    * clamp into a saturated, non-filtering sketch. Beyond the ceiling
    * fall back to `newAgainst`'s plain anti-join.
    * Everything stays codegen'd Catalyst (`BloomFilterAggregate` /
    * `BloomFilterMightContain`, the engine's own runtime-filter
    * machinery) — no driver-side bloom, no UDF. */
  def newAgainstBloom(history: DataFrame, incoming: DataFrame, id: Column,
                      key: Column, expectedItems: Long,
                      fpp: Double = 0.03): DataFrame = {
    import org.apache.spark.sql.graft.bridge
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val numBits = bloomBits(history.sparkSession, expectedItems, fpp)
    val bloom = history.agg(bridge.column(new BloomFilterAggregate(
        bridge.expression(xxhash64(key)),
        bridge.expression(lit(expectedItems)),
        bridge.expression(lit(numBits))).toAggregateExpression())
      .as("__bf"))
    val inc = incoming.select(id.as("new_id"), key.as("_key"))
      .groupBy(col("_key")).agg(min(col("new_id")).as("new_id"))
    // might_contain requires its sketch as a constant or SCALAR SUBQUERY
    // (the same shape Spark's own runtime row-group filters inject): the
    // subquery runs once and its result rides to every task as a literal.
    // An EMPTY history folds to a NULL sketch (BloomFilterAggregate.eval
    // at zero cardinality), and might_contain(null, h) is null — which
    // would fail BOTH branch filters and silently drop every incoming
    // row; coalesce(false) makes the null sketch mean "contains nothing",
    // newAgainst's answer.
    val bloomSub = org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
      bridge.analyzed(bloom))
    bloomRoute(inc,
      coalesce(bridge.column(BloomFilterMightContain(bloomSub,
        bridge.expression(xxhash64(col("_key"))))), lit(false)),
      history.select(key.as("_key")).distinct())
  }

  /** The frozen-model form of the bloom prefilter for STREAMING use: a
    * ONE-ROW `__bf` frame folding the history sketch. PERSIST it at the
    * call site and hand it to `newAgainstSketch` — each micro-batch's
    * scalar subquery then reads the cached row instead of re-scanning
    * history, and the plan carries a subquery reference, NOT megabytes
    * of sketch bytes re-materialized as a literal per batch. Lazy: no
    * job runs until the first batch. An empty history folds to a null
    * sketch, which `bloomRoute`'s coalesce reads as "contains nothing"
    * — everything routes to new, `newAgainst`'s answer. */
  def bloomSketchFrame(history: DataFrame, key: Column, expectedItems: Long,
                       fpp: Double = 0.03): DataFrame = {
    import org.apache.spark.sql.graft.bridge
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val numBits = bloomBits(history.sparkSession, expectedItems, fpp)
    history.agg(bridge.column(new BloomFilterAggregate(
        bridge.expression(xxhash64(key)),
        bridge.expression(lit(expectedItems)),
        bridge.expression(lit(numBits))).toAggregateExpression())
      .as("__bf"))
  }

  /** `newAgainstBloom` against PRE-BUILT frozen artifacts: a (persisted)
    * one-row `bloomSketchFrame` and a (persisted) one-column `_key`
    * distinct history frame that serves every batch's verify join. */
  def newAgainstSketch(incoming: DataFrame, id: Column, key: Column,
                       sketchFrame: DataFrame,
                       historyKeys: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.bridge
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    val inc = incoming.select(id.as("new_id"), key.as("_key"))
      .groupBy(col("_key")).agg(min(col("new_id")).as("new_id"))
    val sub = org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
      bridge.analyzed(sketchFrame))
    bloomRoute(inc,
      coalesce(bridge.column(BloomFilterMightContain(sub,
        bridge.expression(xxhash64(col("_key"))))), lit(false)),
      historyKeys)
  }

  /** Shared bloom routing: definitely-new keys pass straight through;
    * `maybe` positives (true dups + fpp of the novel keys) verify
    * exactly against the history keys. `historyKeys` must be a one-column
    * `_key` frame. */
  private def bloomRoute(inc: DataFrame, maybe: Column,
                         historyKeys: DataFrame): DataFrame = {
    val flagged = inc.withColumn("__maybe", maybe)
    flagged.filter(!col("__maybe")).select(col("new_id"))
      .union(flagged.filter(col("__maybe"))
        .join(historyKeys, Seq("_key"), "left_anti")
        .select(col("new_id")))
  }

  /** Sketch sizing shared by the bloom dedup paths — REFUSES a silently
    * saturating configuration: `BloomFilterAggregate` clamps its inputs
    * to `spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits`
    * (defaults 4M items / 64Mbit = 8 MB) via `Math.min`, so asking for
    * 100M keys under default confs would yield an 8 MB sketch whose
    * effective fpp approaches 1 — the prefilter would silently stop
    * filtering while still paying the sketch build. Raise those confs to
    * run bigger regimes (~1.2·n·|ln fpp| bits; 100M keys at 3% ≈ 90 MB),
    * and keep the result under a broadcastable size. */
  private def bloomBits(spark: org.apache.spark.sql.SparkSession,
                        expectedItems: Long, fpp: Double): Long = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"bad bloom sizing: n=$expectedItems fpp=$fpp")
    val numBits = math.max(64L, math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val maxBits = spark.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864")
      .toLong
    // only the BITS clamp saturates the sketch into uselessness. The
    // maxNumItems conf (default 4M) clamping the item ESTIMATE merely
    // computes the hash-function count for fewer items — a small fpp
    // drift, and exactness is unconditional anyway (positives verify).
    require(numBits <= maxBits,
      s"bloom sketch for n=$expectedItems fpp=$fpp needs $numBits bits " +
        s"but the session caps it at $maxBits " +
        "(spark.sql.optimizer.runtime.bloomFilter.maxNumBits) — the " +
        "clamped sketch would saturate and stop filtering; raise the " +
        "conf or fall back to newAgainst")
    numBits
  }

  /** The history side of INCREMENTAL substring dedup: every distinct
    * k-shingle hash the corpus contains (no >=2 threshold — one history
    * occurrence is enough to make an incoming span a duplicate).
    * Corpus-scale output; keep it a DataFrame and let the per-batch
    * semi-join shuffle it — never collect or broadcast it. */
  def substringHistoryHashes(history: DataFrame, text: Column,
                             k: Int = 15): DataFrame =
    substringTables(history, lit(0L), text, k)._1
      .select(col("h1"), col("h2")).distinct()

  /** Incremental exact-substring cleaning: drop from each BATCH document
    * every >= `k`-token span that already occurs in the history corpus
    * (`substringHistoryHashes`). Batch-INTERNAL duplication is
    * deliberately not considered — that is `substringDedup`'s batch
    * contract; this is the new-data-vs-lake discipline shared by the
    * other `*Against` incrementals. Same output columns as
    * `substringDedup`. */
  def substringCleanAgainst(batch: DataFrame, id: Column, text: Column,
                            historyHashes: DataFrame,
                            k: Int = 15): DataFrame = {
    val (sh, tok) = substringTables(batch, id, text, k)
    // left_semi with a SHUFFLE_HASH hint: the history side must never
    // become a broadcast build (it is corpus-scale)
    val dupStarts = sh.join(historyHashes.hint("SHUFFLE_HASH"),
        Seq("h1", "h2"), "left_semi")
      .select(col("doc_id"), col("s").as("p"),
        lit(null).cast("string").as("tok"), lit(1).as("dup"))
    substringAssemble(tok, dupStarts, k)
  }

  /** Positional shingle + token tables shared by the substring family:
    * `(doc_id, s, h1, h2)` k-shingle starts with 128-bit hash pairs, and
    * `(doc_id, p, tok, dup=0)` tokens. Span MATCHING is case-insensitive
    * (hashes over lowercased tokens); the token table keeps the ORIGINAL
    * text, so reassembly is byte-preserving for every kept token —
    * lowercasing never moves a space, so positions align between the two
    * splits. */
  private def substringTables(docs: DataFrame, id: Column, text: Column,
                              k: Int): (DataFrame, DataFrame) = {
    // parallelism floor (round 16): the k-token shingle double-hash
    // explode below is the substring family's CPU bottleneck (profiled
    // 3.5 s single-task at sf0.1) and must not fuse into a 1-split scan
    val toks = Tuning.boostMapParallelism(
      docs.select(id.as("doc_id"), text.as("__t")))
      .select(col("doc_id"), split(col("__t"), " ").as("rt"),
        split(lower(col("__t")), " ").as("t"))
    // both hash lanes are computed INSIDE the transform struct so the
    // pre-explode array holds ~20 bytes per position — carrying the
    // k-token shingle TEXT there instead would transiently amplify
    // every document ~k× in the scan stage (the concat evaluates twice,
    // which is cheap; the memory amplification is not)
    val sh = toks.filter(size(col("t")) >= k)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("t")) - k),
        i => struct(i.as("s"),
          xxhash64(concat_ws(" ", slice(col("t"), i + 1, lit(k))))
            .as("h1"),
          xxhash64(lit(1L),
            concat_ws(" ", slice(col("t"), i + 1, lit(k)))).as("h2"))))
        .as("sh"))
      // 128-bit shingle identity (two independently-seeded xxhash64
      // lanes): a SINGLE 64-bit key meets birthday collisions at the
      // 100 TB corpus scale this family documents (~1e10-1e11 shingles
      // → expected collisions ≈ n²/2^65 — thousands), and a collision
      // here silently deletes unique text. The pair pushes that to
      // n²/2^129 ≈ 1e-17 — negligible by any operational standard.
      // Shingle text never leaves the scan stage; 16 bytes/key shuffle.
      .select(col("doc_id"), col("sh.s").as("s"),
        col("sh.h1").as("h1"), col("sh.h2").as("h2"))
    val tok = toks.select(col("doc_id"), posexplode(col("rt")))
      .toDF("doc_id", "p", "tok")
      .withColumn("dup", lit(0))
    (sh, tok)
  }

  /** Coverage + reassembly shared by the substring family: union the
    * dup-start flag rows into the token stream, mark covered tokens with
    * one bounded-RANGE doc-keyed window, and rebuild the kept text (see
    * `substringDedup` for why this never joins flags against tokens). */
  private def substringAssemble(tok: DataFrame, dupStarts: DataFrame,
                                k: Int): DataFrame = {
    val frame = Window.partitionBy("doc_id").orderBy("p")
      .rangeBetween(-(k - 1), 0)
    val cov = tok.unionByName(dupStarts)
      .withColumn("covered", max(col("dup")).over(frame))
      .filter(col("tok").isNotNull) // drop the flag rows
    cov.groupBy(col("doc_id")).agg(
      count(lit(1)).cast("long").as("n_tokens"),
      sum(when(col("covered") === 0, 1L).otherwise(0L)).as("n_kept"),
      concat_ws(" ", transform(
        array_sort(collect_list(
          when(col("covered") === 0, struct(col("p"), col("tok"))))),
        x => x.getField("tok"))).as("clean_text"))
  }

  /** Content-defined chunking (CDC) over the token stream — the storage-
    * dedup primitive (Muthitacharoen/Chen/Mazières, "A Low-Bandwidth
    * Network File System", SOSP 2001), word-granular: token `i` CLOSES a
    * chunk when the 60-bit rolling hash of the `w`-gram ending at `i`
    * (`WordGramHashes(lower(text), w)`) is 0 mod 2^maskBits, so cut
    * points move with content and an insertion early in a document
    * re-aligns after ~one chunk instead of shifting every later chunk
    * (the fixed-size-block failure CDC exists to fix). Expected chunk
    * length is 2^maskBits tokens. Unlike LBFS we impose no min/max
    * clamp: a clamp makes each cut depend on the previous cut
    * (sequential per doc), while the unclamped rule keeps the decision
    * per-position — one `posexplode` + one doc-keyed window, the same
    * shape as `substringDedup`. At the default 2^4 the runt/giant chunks
    * a clamp suppresses are a tail, not a mode.
    *
    * Chunk identity hashes the chunk's ORDERED per-token (1-gram)
    * hashes, not the overlapping boundary grams, so an equal token run
    * chunk-aligns and fingerprints equal across documents regardless of
    * what surrounds it. Docs shorter than `w` tokens form one chunk
    * (no complete boundary gram exists).
    *
    * Returns one row per chunk: (doc_id, chunk, n_tokens, chunk_fp).
    *
    * Scale: grams hash natively in the scan (no gram strings shuffle);
    * the only exchange is the doc-keyed window shuffle + the per-chunk
    * aggregate that rides the same partitioning. No cross-doc work —
    * corpus-wide duplicate detection is a hash aggregate on `chunk_fp`
    * downstream (`cdcDedupStats`). */
  def cdcChunks(docs: DataFrame, id: Column, text: Column,
                w: Int = 4, maskBits: Int = 4): DataFrame = {
    require(w >= 1 && maskBits >= 1)
    val m = 1L << maskBits
    val base = docs.select(id.as("doc_id"),
      graft.functions.HashExpressions.wordGramHashes(lower(text), 1)
        .as("th"),
      graft.functions.HashExpressions.wordGramHashes(lower(text), w)
        .as("bh"))
    // token index i (0-based): boundary iff a complete w-gram ends at i
    // (i >= w-1 with at least w tokens) and its hash lands on the mask.
    // bh is 1-based; the gram ending at token i starts at i-w+1 → index
    // i-w+2. size(th) <= w collapses bh to one truncated gram — only
    // i = w-1 (= the last token) could consult it, and a boundary at the
    // final token splits nothing, so the truncated case is consistent.
    val toks = base
      .select(col("doc_id"), col("bh"), size(col("th")).as("n"),
        posexplode(col("th")).as(Seq("i", "h")))
      .withColumn("bd",
        col("i") >= w - 1 && col("n") >= w &&
          pmod(element_at(col("bh"), col("i") - (w - 2)), lit(m)) === 0)
    // chunk id = boundaries strictly BEFORE this token (a boundary token
    // is the last member of its chunk)
    val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("chunk",
        coalesce(sum(col("bd").cast("long")).over(wPrev), lit(0L)))
      .groupBy(col("doc_id"), col("chunk"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("i"), col("h")))),
          x => x.getField("h").cast("string")))).as("chunk_fp"))
  }

  /** Per-document CDC dedup accounting: of the doc's chunks, how many
    * (and how many tokens) also occur elsewhere in the corpus — the
    * "bytes you would not store twice" number a chunk store reports.
    * A chunk is duplicate when its fingerprint occurs more than once
    * corpus-wide (including multiplicity inside one doc).
    *
    * Scale: ONE extra shuffle over `cdcChunks` — the corpus-wide
    * occurrence count is a window keyed by `chunk_fp` (hash partition
    * on a 32-hex key; no skew beyond true duplicate mass, and a chunk
    * duplicated billions of times is exactly the boilerplate the report
    * exists to find — AQE splits that partition). */
  def cdcDedupStats(docs: DataFrame, id: Column, text: Column,
                    w: Int = 4, maskBits: Int = 4): DataFrame = {
    val ch = cdcChunks(docs, id, text, w, maskBits)
    val byFp = Window.partitionBy(col("chunk_fp"))
    ch.withColumn("copies", count(lit(1)).over(byFp))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_chunks"),
        sum(when(col("copies") > 1, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(when(col("copies") > 1, col("n_tokens")).otherwise(0L))
          .cast("long").as("dup_tokens"))
  }

  /** The chunk store's fingerprint table for `cdcNewChunks`: distinct
    * chunk fingerprints of everything already stored. Persist this
    * (parquet) between batches — it only ever UNIONs with each batch's
    * new fingerprints, the chunk-store growth pattern. */
  def cdcHistoryFps(history: DataFrame, id: Column, text: Column,
                    w: Int = 4, maskBits: Int = 4): DataFrame =
    cdcChunks(history, id, text, w, maskBits)
      .select(col("chunk_fp")).distinct()

  /** Incremental CDC — the chunk-store ingest question: of an incoming
    * batch's chunks, which does the store already hold (transfer/store
    * nothing) and how many tokens are genuinely new? The CDC
    * re-alignment property is what makes this accounting strong: a doc
    * that differs from a stored one by an insertion still matches on
    * every chunk past the edit window.
    *
    * Scale: the history fingerprint table is corpus-scale — it joins as
    * a SHUFFLE_HASH equi-join on the fingerprint (never a broadcast),
    * the same history contract as `substringCleanAgainst`; the incoming
    * side pays only its own chunking windows. */
  def cdcNewChunks(historyFps: DataFrame, incoming: DataFrame,
                   id: Column, text: Column,
                   w: Int = 4, maskBits: Int = 4): DataFrame = {
    val ch = cdcChunks(incoming, id, text, w, maskBits)
    val known = historyFps.select(col("chunk_fp"))
      .withColumn("known", lit(1L))
    ch.join(known.hint("shuffle_hash"), Seq("chunk_fp"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_chunks"),
        sum(when(col("known").isNotNull, 1L).otherwise(0L))
          .as("n_known_chunks"),
        sum(col("n_tokens")).cast("long").as("n_tokens"),
        sum(when(col("known").isNull, col("n_tokens")).otherwise(0L))
          .cast("long").as("new_tokens"))
  }
}
