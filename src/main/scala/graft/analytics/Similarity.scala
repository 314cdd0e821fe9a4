package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (exact, O(|Q|·|C|) — broadcast the
  * query side, never shuffle the corpus). Scale path: IVF-style inverted
  * file — cluster corpus once, probe a few clusters per query, turning the
  * scan into a partition-pruned fraction of the corpus.
  *
  * All arithmetic is float→double cast then a sequential left-to-right fold
  * (`aggregate`/`zip_with`), which makes results bit-reproducible and
  * engine-portable for the DuckDB oracles.
  */
object Similarity {

  /** Dot product of two array<double> columns: native single-pass
    * sequential fold (graft.functions.DotProduct) — bit-identical to the
    * composed `aggregate(zip_with(...))` form (same left-to-right order)
    * but without the two interpreted lambda dispatches per dimension that
    * dominate the similarity scans. */
  def dot(a: Column, b: Column): Column =
    graft.functions.HashExpressions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  private[analytics] def asDouble(c: Column): Column =
    c.cast("array<double>")

  /** All pairs (a_id < b_id) with cosine similarity — the exhaustive-exact
    * baseline used to validate `srpLshPairs` recall in SimilaritySpec.
    * Quadratic by definition; production near-dup goes through
    * `srpLshPairs` (bucketed, no cross join). */
  def cosinePairs(emb: DataFrame, id: Column, vec: Column): DataFrame = {
    val n = emb.select(id.as("id"), asDouble(vec).as("v"))
      .withColumn("nrm", norm(col("v")))
    val a = n.select(col("id").as("a_id"), col("v").as("a_v"),
      col("nrm").as("a_n"))
    val b = n.select(col("id").as("b_id"), col("v").as("b_v"),
      col("nrm").as("b_n"))
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(dot(col("a_v"), col("b_v")) / (col("a_n") * col("b_n")), 4)
          .as("sim"))
  }

  /** SRP-LSH near-dup pairs `(a_id, b_id, sim)` with cosine >= threshold:
    * the bucketed scale path for embedding dedup. Signed-random-projection
    * signatures (`graft.functions.SrpBandBuckets`: bit i = sign(v·r_i),
    * deterministic Gaussian hyperplanes) are banded exactly like
    * `Dedup.minhashLshPairs` — docs sharing any (band, bucket) become
    * candidates via an equi-join, and exact cosine verifies candidates, so
    * precision is exact and only recall is probabilistic.
    *
    * With defaults b=24 bands × r=16 bits: P[pair ≥ 0.97 cosine missed]
    * ≈ 5e-4, ≥ 0.99 ≈ 2e-7; bucket space per band is 2^16, so on spread
    * data candidates ≈ true near-dups (no all-pairs blowup). At larger
    * corpus sizes raise `bitsPerBand` toward log2(n) to keep buckets
    * sparse — recall is then recovered by raising `bands`.
    *
    * Scale: one equi-join shuffle on (band, bucket) + one candidate-only
    * verify join; the corpus is never cross-joined (plan audited:
    * no BroadcastNestedLoopJoin/CartesianProduct). */
  def srpLshPairs(emb: DataFrame, id: Column, vec: Column, threshold: Double,
                  bands: Int = 24, bitsPerBand: Int = 16): DataFrame = {
    // Persisted: branches into candidate generation AND verification.
    val n = Caches.persist(
      emb.select(id.as("id"), asDouble(vec).as("v"))
        .withColumn("nrm", norm(col("v")))
        .withColumn("bkts", graft.functions.HashExpressions
          .srpBandBuckets(col("v"), bands, bitsPerBand)))
    val banded = n.select(col("id"),
      posexplode(col("bkts")).as(Seq("band", "bucket")))
    val l = banded.select(col("id").as("a_id"), col("band"), col("bucket"))
    val r = banded.select(col("id").as("b_id"), col("band"), col("bucket"))
    val cand = l.join(r, Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")
    val a = n.select(col("id").as("a_id"), col("v").as("a_v"),
      col("nrm").as("a_n"))
    val b = n.select(col("id").as("b_id"), col("v").as("b_v"),
      col("nrm").as("b_n"))
    cand.join(a, Seq("a_id")).join(b, Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        round(dot(col("a_v"), col("b_v")) / (col("a_n") * col("b_n")), 4)
          .as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Incremental SRP-LSH near-dup filter: which `incoming` vectors are
    * near-duplicates (cosine >= threshold) of the already-clean `history`
    * — `Dedup.nearDupAgainst`'s embedding counterpart for the daily
    * append workflow. Returns `(new_id, dup_of, sim)`.
    *
    * Scale: the increment's band buckets equi-join against the history's
    * — shuffle keyed by (band, bucket), volume O(increment + matching
    * history buckets), never a history self-join; at 100 TB the history
    * bucket table is computed once and reused across increments. Exact
    * cosine verifies only the candidates, so precision is exact and only
    * recall is probabilistic (same b×r trade-off as `srpLshPairs`). */
  def srpLshPairsAgainst(history: DataFrame, incoming: DataFrame,
                         id: Column, vec: Column, threshold: Double,
                         bands: Int = 24, bitsPerBand: Int = 16): DataFrame =
    srpLshPairsAgainstPrepped(srpPrep(history, id, vec, bands, bitsPerBand),
      incoming, id, vec, threshold, bands, bitsPerBand)

  /** Precompute (and persist) one side's tables for
    * `srpLshPairsAgainstPrepped`: normed double vectors + SRP band
    * buckets. Compute the HISTORY side once and reuse it across
    * increments/micro-batches — rebuilding it per batch re-scans the
    * whole history corpus (the streaming gate does exactly this hoist). */
  def srpPrep(emb: DataFrame, id: Column, vec: Column,
              bands: Int = 24, bitsPerBand: Int = 16): DataFrame =
    Caches.persist(
      emb.select(id.as("id"), asDouble(vec).as("v"))
        .withColumn("nrm", norm(col("v")))
        .withColumn("bkts", graft.functions.HashExpressions
          .srpBandBuckets(col("v"), bands, bitsPerBand)))

  /** `srpLshPairsAgainst` with the history side already prepared by
    * `srpPrep` (with the SAME bands/bitsPerBand). Only the incoming side
    * is prepped per call. */
  def srpLshPairsAgainstPrepped(historyPrep: DataFrame, incoming: DataFrame,
                                id: Column, vec: Column, threshold: Double,
                                bands: Int = 24,
                                bitsPerBand: Int = 16): DataFrame = {
    val h = historyPrep
    val i = srpPrep(incoming, id, vec, bands, bitsPerBand)
    def banded(n: DataFrame, name: String) = n.select(col("id").as(name),
      posexplode(col("bkts")).as(Seq("band", "bucket")))
    val cand = banded(i, "new_id")
      .join(banded(h, "dup_of").hint("SHUFFLE_HASH"), Seq("band", "bucket"))
      .select("new_id", "dup_of")
      .dropDuplicates("new_id", "dup_of")
    val iv = i.select(col("id").as("new_id"), col("v").as("i_v"),
      col("nrm").as("i_n"))
    val hv = h.select(col("id").as("dup_of"), col("v").as("h_v"),
      col("nrm").as("h_n"))
    cand.join(iv, Seq("new_id")).join(hv, Seq("dup_of"))
      .select(col("new_id"), col("dup_of"),
        round(dot(col("i_v"), col("h_v")) / (col("i_n") * col("h_n")), 4)
          .as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** SRP-LSH approximate top-k: the bucketed alternative to `ivfTopK` —
    * no centroid pass at all. Queries and corpus share the same SRP band
    * signatures (coarser than dedup's: fewer bits per band, so moderate-
    * cosine neighbors still collide); a corpus vector is scored for a
    * query only when they share at least one (band, bucket). One equi-join
    * on the banded keys (query side broadcast — it is the small side by
    * definition), exact cosine on candidates, per-query top-k. Recall
    * rises with `bands`, scan fraction falls with `bitsPerBand` — both
    * per-query knobs, no index rebuild. */
  def srpTopK(queries: DataFrame, corpus: DataFrame, qId: Column,
              qVec: Column, cId: Column, cVec: Column, k: Int,
              bands: Int = 24, bitsPerBand: Int = 6): DataFrame =
    // single-probe IS the flips=0 multi-probe (SrpProbeBuckets emits
    // exactly the base bucket per band) — one implementation of the
    // candidate/verify/rank pipeline, pinned equal in SimilaritySpec
    srpMultiProbeTopK(queries, corpus, qId, qVec, cId, cVec, k,
      bands, bitsPerBand, flips = 0)

  /** Multi-probe SRP top-k (the standard multi-probe LSH recall upgrade,
    * Lv et al. VLDB 2007): identical corpus index to `srpTopK` — plain
    * band buckets, NO reindexing — but each query probes, per band, its
    * base bucket PLUS `flips` neighbor buckets obtained by flipping the
    * band's lowest-|margin| bits (the projections closest to their
    * hyperplane, i.e. the bits most likely to differ on a true near
    * neighbor). Lifts recall at FIXED bands/bits for (flips+1)× the probe
    * rows — query-side cost only, the corpus scan fraction per probe is
    * unchanged. Candidates are exact-cosine verified and ranked exactly
    * like `srpTopK`; since probe 0 is the base bucket, the candidate set
    * is a SUPERSET of single-probe's — recall can only rise. */
  def srpMultiProbeTopK(queries: DataFrame, corpus: DataFrame, qId: Column,
                        qVec: Column, cId: Column, cVec: Column, k: Int,
                        bands: Int = 24, bitsPerBand: Int = 6,
                        flips: Int = 1): DataFrame = {
    val c = corpus.select(cId.as("c_id"), asDouble(cVec).as("c_v"))
      .withColumn("c_n", norm(col("c_v")))
      .withColumn("bkts", graft.functions.HashExpressions
        .srpBandBuckets(col("c_v"), bands, bitsPerBand))
    val q = queries.select(qId.as("q_id"), asDouble(qVec).as("q_v"))
      .withColumn("q_n", norm(col("q_v")))
      .withColumn("bkts", graft.functions.HashExpressions
        .srpProbeBuckets(col("q_v"), bands, bitsPerBand, flips))
    val cBanded = c.select(col("c_id"),
      posexplode(col("bkts")).as(Seq("band", "bucket")))
    // probe i of the flat array belongs to band i/(flips+1)
    val qBanded = q.select(col("q_id"),
      posexplode(col("bkts")).as(Seq("idx", "bucket")))
      .withColumn("band", (col("idx") / (flips + 1)).cast("int"))
      .drop("idx")
    val cand = cBanded.join(broadcast(qBanded), Seq("band", "bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id").as("n_id"))
      .dropDuplicates("q_id", "n_id")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    cand
      .join(c.select(col("c_id").as("n_id"), col("c_v"), col("c_n")),
        Seq("n_id"))
      .join(broadcast(q.select(col("q_id"), col("q_v"), col("q_n"))),
        Seq("q_id"))
      .select(col("q_id"), col("n_id"),
        round(dot(col("q_v"), col("c_v")) / (col("q_n") * col("c_n")), 4)
          .as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rank"))
  }

  /** Scalar int8 quantization (the SQ8 class of ANN index): per-vector
    * scale = max|x|, q_i = floor(x_i·127/scale + 0.5) ∈ [-127, 127].
    * Per-vector scaling cancels in cosine, so similarity runs directly on
    * the quantized ints — the scan reads 1/4 the bytes of float32 and the
    * dot products are exact integer arithmetic (portable: the DuckDB
    * oracle reproduces them bit-for-bit; floor(+0.5) sidesteps
    * round-half-mode differences between engines). The epsilon guard
    * makes the all-zero vector quantize to zeros instead of dividing by
    * zero — same literal on both engines. */
  def quantizeInt8(vec: Column): Column =
    quantizeInt8(vec, int8Scale(vec))

  /** The per-vector scale (max|x|, epsilon-guarded). Callers on hot paths
    * hoist this into its own column first — embedding it inside the
    * transform lambda would re-scan the vector per element (O(d²)). */
  def int8Scale(vec: Column): Column =
    greatest(array_max(transform(vec, x => abs(x))), lit(1e-30))

  def quantizeInt8(vec: Column, scale: Column): Column =
    transform(vec, x => floor(x * 127.0 / scale + 0.5).cast("long"))

  /** Brute-force cosine top-k over int8-quantized vectors: same plan shape
    * as `bruteForceTopK` (broadcast queries, corpus never shuffles), but
    * the per-pair work is an integer dot product — the quantized exact
    * baseline a PQ/IVF-SQ8 pipeline verifies against. Quantization is
    * index-build cost, amortized in production by writing `q` once. */
  def int8TopK(queries: DataFrame, corpus: DataFrame, qId: Column,
               qVec: Column, cId: Column, cVec: Column, k: Int): DataFrame = {
    // quantized ints ride as exact doubles: products <= 127^2 and sums
    // <= 64*127^2 stay integer-exact in the double fold, matching the
    // oracle's BIGINT arithmetic bit-for-bit. The scale hoists into its
    // own column so quantization stays O(d) per vector.
    def prep(df: DataFrame, id: Column, vec: Column, p: String) =
      df.select(id.as(s"${p}_id"), asDouble(vec).as("_v"))
        .withColumn("_s", int8Scale(col("_v")))
        .withColumn(s"${p}_q",
          quantizeInt8(col("_v"), col("_s")).cast("array<double>"))
        .withColumn(s"${p}_n", sqrt(dot(col(s"${p}_q"), col(s"${p}_q"))))
        .drop("_v", "_s")
    val q = prep(queries, qId, qVec, "q")
    val c = prep(corpus, cId, cVec, "c")
      .withColumnRenamed("c_id", "n_id")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(dot(col("q_q"), col("c_q")) / (col("q_n") * col("c_n")), 4)
          .as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rank"))
  }

  /** One 32-bit sign word from dims [from, from+32): bit i set where
    * the component is strictly positive, packed as Σ 2^i — exact
    * integer arithmetic under 2^32 in both engines (DuckDB replays via
    * `power(2, i)::BIGINT`, exact in a double far below 2^53). */
  private def signWord32(v: Column, from: Int): Column =
    aggregate(
      zip_with(slice(v, from + 1, 32), sequence(lit(0), lit(31)),
        (x, i) => when(x > 0, pow(lit(2.0), i).cast("long"))
          .otherwise(lit(0L))),
      lit(0L), (a, b) => a + b)

  /** Binary (1-bit sign) quantization + Hamming-distance top-k — the
    * cheapest ANN scan tier (Charikar STOC 2002's sign sketch applied
    * with the identity rotation: for near-isotropic embeddings the raw
    * coordinate signs already behave like random hyperplanes): each
    * 64-dim vector packs into TWO 32-bit sign words (8 bytes — 32× byte
    * compression like PQ, but the distance is two XOR+popcounts instead
    * of m table lookups, the cheapest comparison that exists). Hamming
    * distance approximates angle (E[hamming] = dim·θ/π), so ranking by
    * (hamming asc, n_id) is a cosine-ordering surrogate whose recall
    * is measured, not assumed (RecallSpec), and whose real use is
    * NOMINATION for an exact re-rank (`hammingRerankTopK`).
    *
    * Engine-portable by construction: sign words are exact integer
    * sums, XOR/bit_count are exact in both engines — the whole operator
    * is hash-checked, no tolerance anywhere.
    *
    * Plan shape: signing is O(d) per vector inside the scan projection;
    * the scan carries 2 longs per vector; the query side broadcasts;
    * one window ranks. At 100 TB this is the first-stage filter that
    * reads 1/32 of the bytes with no index build at all — compose with
    * IVF pruning when even the bit scan is too much. */
  def hammingTopK(queries: DataFrame, corpus: DataFrame, qId: Column,
                  qVec: Column, cId: Column, cVec: Column,
                  k: Int): DataFrame = {
    def prep(df: DataFrame, id: Column, vec: Column, p: String) =
      df.select(id.as(s"${p}_id"), asDouble(vec).as("_v"))
        .withColumn(s"${p}_lo", signWord32(col("_v"), 0))
        .withColumn(s"${p}_hi", signWord32(col("_v"), 32))
        .drop("_v")
    val q = prep(queries, qId, qVec, "q")
    val c = prep(corpus, cId, cVec, "c")
      .withColumnRenamed("c_id", "n_id")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("hamming").asc, col("n_id"))
    c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (bit_count(col("q_lo").bitwiseXOR(col("c_lo"))) +
          bit_count(col("q_hi").bitwiseXOR(col("c_hi"))))
          .cast("long").as("hamming"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("hamming"), col("rank"))
  }

  /** Hamming nomination + exact-cosine re-rank: the two-stage shape
    * where the 8-byte bit scan nominates `pool` and only those pay the
    * full-precision dot product — recall becomes pool containment
    * (RecallSpec floors), scan bytes stay 1/32. */
  def hammingRerankTopK(queries: DataFrame, corpus: DataFrame,
                        qId: Column, qVec: Column, cId: Column,
                        cVec: Column, k: Int,
                        pool: Int = 100): DataFrame =
    rerankExact(
      hammingTopK(queries, corpus, qId, qVec, cId, cVec, pool),
      queries, corpus, qId, qVec, cId, cVec, k)

  /** Exact brute-force top-k: broadcast the (small) query set against the
    * corpus, rank per query. Tie-break on rounded sim then id →
    * deterministic. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, qId: Column,
                     qVec: Column, cId: Column, cVec: Column,
                     k: Int): DataFrame = {
    val q = queries.select(qId.as("q_id"), asDouble(qVec).as("q_v"))
      .withColumn("q_n", norm(col("q_v")))
    val c = corpus.select(cId.as("n_id"), asDouble(cVec).as("c_v"))
      .withColumn("c_n", norm(col("c_v")))
    val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(dot(col("q_v"), col("c_v")) / (col("q_n") * col("c_n")), 4)
          .as("sim"))
    // bounded top-k AGGREGATE, not a window: the scored frame is
    // |queries|×|corpus| rows, of which only |queries|×k survive — the
    // partial-aggregatable TopKByScore keeps k per q_id per map task, so
    // the exchange carries O(queries × k × tasks) rows and nothing is
    // globally sorted (a row_number window shuffles + sorts every
    // candidate). Ordering contract is row_number-identical
    // (sim desc, n_id asc), so every oracle is unchanged.
    topKExplode(scored, k)
  }

  /** Shared tail for candidate-scored top-k operators: per q_id, the
    * bounded (sim desc, n_id) top-k via the native aggregate, exploded
    * back to `(q_id, n_id, sim, rank)` rows. */
  private[analytics] def topKExplode(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("q_id"))
      .agg(graft.functions.HashExpressions
        .topKByScore(col("sim"), col("n_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), col("t.id").as("n_id"), col("t.score").as("sim"),
        (col("pos") + 1).as("rank"))

  /** Graph-traversal ANN: answer queries by BEAM SEARCH over a
    * precomputed neighbor graph — the navigable-small-world serving idea
    * (Malkov & Yashunin TPAMI 2018's base layer; Fu et al. VLDB 2019's
    * search loop), re-expressed as bounded relational rounds instead of
    * a per-query priority queue.
    *
    * The input edge frame is SYMMETRIZED first (NSW search walks links
    * both ways — directed-only k-NN digraphs strand queries in local
    * basins; measured mean recall@10 0.545 → 0.825 at 2k vectors), and
    * every node is expanded AT MOST ONCE (the HNSW searchLayer
    * discipline): each hop picks every query's `beam` best scored
    * not-yet-expanded nodes, expands their links, scores only that
    * frontier, and merges it into the visited set. After `hops` rounds
    * the answer is the visited set's top-k. Determinism: sims round to
    * 4dp with (sim desc, id asc) ordering everywhere (the
    * `bruteForceTopK` contract), hub entries break in-degree ties on
    * the smaller node, so the oracle replays the traversal
    * hop-by-hop.
    *
    * Scale shape — this is the serving path whose per-query cost is
    * INDEPENDENT of corpus size: each hop scores ≤ |queries| × beam ×
    * degree candidate rows (a shuffle-hash join against the corpus on
    * the candidate ids — never a corpus scan, unlike IVF's
    * nProbe/nLists fraction), and the visited set is bounded by hops ×
    * that. The graph itself is the expensive once-per-corpus artifact —
    * at 100 TB it comes from the persisted IVF index
    * (`knnGraphIvf`-style nomination), exactly like `Graph.pageRank`'s
    * production edge frame. Lineage is localCheckpoint-bounded per hop.
    *
    * Output: `(q_id, n_id, sim, rank)`, self-matches excluded. */
  def graphTopK(queries: DataFrame, corpus: DataFrame, edges: DataFrame,
                qId: Column, qVec: Column, cId: Column, cVec: Column,
                src: Column, dst: Column, k: Int, beam: Int = 16,
                hops: Int = 6, entries: Int = 8): DataFrame = {
    val e0 = edges.select(src.as("src"), dst.as("dst"))
    val e = Caches.persist(
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .distinct())
    val c = Caches.persist(
      corpus.select(cId.as("n_id"), asDouble(cVec).as("c_v"))
        .withColumn("c_n", norm(col("c_v"))))
    val q = Caches.persist(
      queries.select(qId.as("q_id"), asDouble(qVec).as("q_v"))
        .withColumn("q_n", norm(col("q_v"))))
    // hub entry points: highest undirected degree, ties to the smaller
    // node — one aggregate over the edge frame, |entries| rows
    val ent = e.groupBy(col("dst").as("n_id"))
      .agg(count(lit(1)).as("ind"))
      .orderBy(col("ind").desc, col("n_id")).limit(entries)
      .select(col("n_id"))
    // score a (q_id, n_id) candidate frame: hash-join the corpus on the
    // candidate id (touches only candidate rows), broadcast the queries
    def score(cand: DataFrame): DataFrame =
      cand.join(c, Seq("n_id"))
        .join(broadcast(q), Seq("q_id"))
        .filter(col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("n_id"),
          round(dot(col("q_v"), col("c_v")) / (col("q_n") * col("c_n")), 4)
            .as("sim"))
    var visited = score(q.select(col("q_id")).crossJoin(ent))
      .localCheckpoint(false)
    var expanded = visited.select(col("q_id"), col("n_id"))
      .filter(lit(false)).localCheckpoint(false)
    (1 to hops).foreach { _ =>
      val frontier = topKExplode(
        visited.join(expanded, Seq("q_id", "n_id"), "left_anti"), beam)
        .select(col("q_id"), col("n_id"))
      expanded = expanded.union(frontier).localCheckpoint(false)
      val cand = frontier.join(e, frontier("n_id") === e("src"))
        .select(col("q_id"), col("dst").as("n_id")).distinct()
      visited = visited.union(score(cand)).distinct()
        .localCheckpoint(false)
    }
    topKExplode(visited, k)
  }

  /** IVF (inverted-file) approximate top-k: assign every corpus vector to
    * its nearest of `nLists` centroids (deterministic seed), then answer a
    * query by scanning only the `nProbe` nearest lists. At 100 TB this is
    * the difference between a full scan and reading nProbe/nLists of the
    * data; centroid assignment is a broadcast join (centroids are tiny).
    *
    * Centroids here are a deterministic sample of the corpus itself
    * (k-means init without the iterations — recall tested in
    * SimilaritySpec); `refineIters > 0` runs that many Lloyd rounds over
    * the sample (`Clustering.fit` — still fully deterministic and
    * oracle-replayed) before indexing, which moves centroids to density
    * centers and lifts recall at fixed nProbe, and ALSO switches
    * assignment/probing to the zero-shuffle centroid-literal projection
    * (the corpus no longer exchanges on its unique key). `replicas > 1`
    * additionally stores each corpus vector in its `replicas` nearest
    * refined lists — multi-assignment, the closure-clustering idea of
    * SPANN (Chen et al., NeurIPS 2021): on a near-isotropic corpus,
    * where no centroid placement can keep a query's neighbors in few
    * lists (Lloyd alone plateaus at .61 recall@10 here), paying
    * ×replicas index storage is what actually buys recall at FIXED
    * probe cost (measured .455 → .800 at nProbe=4 with refineIters=2,
    * replicas=2 — RecallSpec pins the floor).
    *
    * Plan shape (audited in PlanAuditSpec — no Exchange+Sort on the
    * corpus side): centroid sampling is a hash filter (~1/16 of the
    * corpus) + per-partition top-k merge, never a global corpus sort;
    * centroid assignment is a `max_by` hash aggregate with map-side
    * partial — no window/sort over the unique corpus key; probe selection
    * is a `collect_list`+`array_sort` aggregate over |Q|×nLists rows. The
    * only ranking window left is the final top-k over the pruned scan,
    * which is the query result itself. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, qId: Column,
              qVec: Column, cId: Column, cVec: Column, k: Int,
              nLists: Int = 16, nProbe: Int = 4,
              refineIters: Int = 0, replicas: Int = 1): DataFrame = {
    require(replicas == 1 || refineIters > 0,
      "multi-assignment (replicas > 1) requires the Lloyd-refined path")
    val c = corpus.select(cId.as("n_id"), asDouble(cVec).as("c_v"))
      .withColumn("c_n", norm(col("c_v")))
    val q = queries.select(qId.as("q_id"), asDouble(qVec).as("q_v"))
      .withColumn("q_n", norm(col("q_v")))
    val (assigned, probes) =
      if (refineIters > 0) lloydAssignProbe(corpus, cId, cVec, c, q,
        nLists, nProbe, refineIters, replicas)
      else {
        val centroids = ivfCentroids(c, nLists)
        (ivfAssign(c, centroids, Seq("c_v", "c_n")),
          ivfProbes(q, centroids, nProbe, Seq("q_v", "q_n")))
      }
    // scan only probed lists; rank via the bounded top-k aggregate (the
    // window form shuffled + sorted the whole pruned scan)
    val scored = assigned.join(broadcast(probes), Seq("list_id"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(dot(col("q_v"), col("c_v")) / (col("q_n") * col("c_n")), 4)
          .as("sim"))
    // a replicated vector can surface via two probed lists — collapse
    // before ranking (rows are bit-identical, so the keep is arbitrary
    // yet deterministic); replicas == 1 cannot duplicate, skip the
    // exchange entirely
    topKExplode(
      if (replicas > 1) scored.dropDuplicates("q_id", "n_id") else scored,
      k)
  }

  // ---- shared PQ machinery (pqTopK + ivfPqTopK) ----

  /** md5-derived deterministic rank in [0, 997): the engine-portable
    * sampling hash shared by IVF centroids and PQ codebooks (and replayed
    * literally by the DuckDB oracles — change it NOWHERE in isolation). */
  private[analytics] def hashRank(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10)
      .cast("long"), lit(997))

  /** One struct per subspace: (sub, dim/m-wide slice). */
  private def pqSubSlices(v: Column, m: Int, sub: Int): Column =
    array((0 until m).map(s =>
      struct(lit(s).as("sub"), slice(v, s * sub + 1, sub).as("sv"))): _*)

  // squared L2 via dots: |a-b|^2 = a.a + b.b - 2*a.b (native DotProduct),
  // rounded for an engine-stable argmin...
  private def pqD2(a: Column, b: Column): Column =
    round(dot(a, a) + dot(b, b) - lit(2) * dot(a, b), 6)

  // ...and snapped to INTEGER micros where values get SUMMED: the ADC sum
  // becomes exact integer arithmetic, so float-addition order (Spark
  // partial aggregation vs DuckDB sequential) can never flip a rounded
  // distance.
  private def pqD2i(a: Column, b: Column): Column =
    round((dot(a, a) + dot(b, b) - lit(2) * dot(a, b)) * 1e6, 0).cast("long")

  /** ks hash-sampled codebook rows (sub, j, cw): a distributed TakeOrdered
    * sample, then codeword-id assignment via collect+posexplode over the
    * ks post-limit rows — no Window node anywhere in the subtree. */
  private def pqCodebook(c: DataFrame, m: Int, sub: Int, ks: Int): DataFrame =
    c.withColumn("r", hashRank(col("n_id")))
      .filter(col("r") < 64)
      .orderBy(col("r"), col("n_id")).limit(ks)
      .select(struct(col("r"), col("n_id"), col("c_v")).as("s"))
      .agg(array_sort(collect_list(col("s"))).as("arr"))
      .select(posexplode(col("arr")).as(Seq("p", "s")))
      .select((col("p") + 1).as("j"),
        explode(pqSubSlices(col("s").getField("c_v"), m, sub)).as("e"))
      .select(col("e.sub").as("sub"), col("j"), col("e.sv").as("cw"))

  /** Corpus codes (n_id, sub, code): nearest codeword per subspace via a
    * map-side-partial min_by (ties: lower codeword id). */
  private def pqEncode(c: DataFrame, cb: DataFrame, m: Int,
                       sub: Int): DataFrame =
    c.select(col("n_id"), explode(pqSubSlices(col("c_v"), m, sub)).as("e"))
      .select(col("n_id"), col("e.sub").as("sub"), col("e.sv").as("cs"))
      .join(broadcast(cb), Seq("sub"))
      .select(col("n_id"), col("sub"), col("j"),
        pqD2(col("cs"), col("cw")).as("d"))
      .groupBy(col("n_id"), col("sub"))
      .agg(min_by(col("j"), struct(col("d"), col("j"))).as("code"))

  /** Per-query subspace distance table (q_id, sub, j, qdi) in integer
    * micros — broadcastable (|Q|*m*ks rows), summed exactly by the ADC. */
  private def pqQueryTable(q: DataFrame, cb: DataFrame, m: Int,
                           sub: Int): DataFrame =
    q.select(col("q_id"), explode(pqSubSlices(col("q_v"), m, sub)).as("e"))
      .select(col("q_id"), col("e.sub").as("sub"), col("e.sv").as("qs"))
      .join(broadcast(cb), Seq("sub"))
      .select(col("q_id"), col("sub"), col("j"),
        pqD2i(col("qs"), col("cw")).as("qdi"))

  /** Final per-query ranking over summed ADC distances. */
  private def pqRank(adc: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adist").asc, col("n_id"))
    adc.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("adist"), col("rank"))
  }

  /** Product-quantization (PQ) approximate top-k with asymmetric distance
    * computation (ADC): vectors split into `m` subvectors, each encoded as
    * the id of its nearest codeword; a query precomputes its
    * subspace-distance table once, and every corpus distance is m table
    * lookups summed — the classic 32x byte-compression scan
    * (m bytes of codes vs 4*dim bytes of floats).
    *
    * Codebooks are a deterministic md5-hash sample of the corpus (k-means
    * init without the iterations, same construction as `ivfTopK`
    * centroids) shared across subspaces — engine-portable, so the whole
    * encode/ADC pipeline is DuckDB-expressible and oracle-checked; swap
    * in per-subspace trained centroids offline without changing the query
    * path. All distances round before any argmin/ranking (ties break on
    * the lower codeword/neighbor id) and the summed partials are integer
    * micros, so FP-sum ordering can never flip a result across engines.
    *
    * Plan shape: codebook and the per-query distance table are broadcast;
    * the corpus is read once, encodes via a map-side-partial `min_by`
    * aggregate, and the ADC scan is one hash aggregate over (q, n)
    * partials — no window/sort anywhere on the corpus, no cross join of
    * raw vectors. At 100 TB compose with IVF list pruning (`ivfPqTopK`)
    * so the ADC scan touches only probed lists. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, qId: Column,
             qVec: Column, cId: Column, cVec: Column, k: Int,
             dim: Int = 64, m: Int = 8, ks: Int = 16): DataFrame = {
    require(dim % m == 0, "m must divide dim")
    val sub = dim / m
    val c = corpus.select(cId.as("n_id"), asDouble(cVec).as("c_v"))
    val cb = pqCodebook(c, m, sub, ks)
    val codes = pqEncode(c, cb, m, sub)
    val q = queries.select(qId.as("q_id"), asDouble(qVec).as("q_v"))
    val qTab = pqQueryTable(q, cb, m, sub)
    val adc = codes.join(broadcast(qTab),
        codes("sub") === qTab("sub") && codes("code") === qTab("j"))
      .filter(col("q_id") =!= col("n_id"))
      .groupBy(col("q_id"), col("n_id"))
      .agg(round(sum(col("qdi")) / 1e6, 6).as("adist"))
    pqRank(adc, k)
  }

  // ---- shared IVF machinery (ivfTopK + ivfPqTopK + ivfSq8TopK) ----
  // One construction, three consumers: the hashRank centroid sample, the
  // (csim, -list_id) max_by assignment and the collect_list probe
  // selection are replayed literally by the DuckDB oracles — change them
  // NOWHERE in isolation.

  /** Deterministic hash-sampled centroids from a corpus frame with
    * (n_id, c_v, c_n): the filter prunes the corpus ~16× before the
    * top-nLists merge, never a global corpus sort. */
  private def ivfCentroids(c: DataFrame, nLists: Int): DataFrame =
    c.withColumn("r", hashRank(col("n_id")))
      .filter(col("r") < 64)
      .orderBy(col("r"), col("n_id")).limit(nLists)
      .select(col("n_id").as("list_id"), col("c_v").as("cent_v"),
        col("c_n").as("cent_n"))

  /** Assign every corpus vector to its max-cosine list: broadcast
    * centroids + map-side-partial max_by (ties: higher csim, then lower
    * list_id; scores round to 6 so cross-engine FP-sum ordering can't
    * flip an argmax). `carried` columns of the corpus frame ride through
    * the aggregate into the result alongside (n_id, list_id). */
  private def ivfAssign(c: DataFrame, centroids: DataFrame,
                        carried: Seq[String]): DataFrame =
    c.join(broadcast(centroids))
      .select(col("n_id") +: col("list_id") +:
        round(dot(col("c_v"), col("cent_v")) / (col("c_n") * col("cent_n")),
          6).as("csim") +: carried.map(col): _*)
      .groupBy(col("n_id"))
      .agg(max_by(struct(col("list_id") +: carried.map(col): _*),
        struct(col("csim"), (-col("list_id")).as("tb"))).as("best"))
      .select(col("n_id") +: col("best.list_id").as("list_id") +:
        carried.map(f => col(s"best.$f").as(f)): _*)

  /** Each query's nProbe nearest lists — a collect_list aggregate over
    * the (tiny) |Q|×nLists score set, exploded to (q_id, carried...,
    * list_id) rows. */
  private def ivfProbes(q: DataFrame, centroids: DataFrame, nProbe: Int,
                        carried: Seq[String]): DataFrame = {
    val aggs = carried.map(f => first(col(f)).as(f)) :+
      slice(array_sort(collect_list(
        struct((-col("qsim")).as("ns"), col("list_id")))), 1, nProbe)
        .as("top")
    q.join(broadcast(centroids))
      .select(col("q_id") +: col("list_id") +:
        round(dot(col("q_v"), col("cent_v")) / (col("q_n") * col("cent_n")),
          6).as("qsim") +: carried.map(col): _*)
      .groupBy(col("q_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("q_id") +: carried.map(col) :+
        explode(col("top.list_id")).as("list_id"): _*)
  }

  /** Lloyd-refined centroid machinery shared by the three IVF variants'
    * `refineIters > 0` path: fit `Clustering`'s deterministic k-means
    * (md5-sampled seeds + `refineIters` assign/update rounds — the exact
    * construction the DuckDB oracles replay via unrolled per-round CTEs),
    * then turn the driver-resident model into (a) a ZERO-SHUFFLE corpus
    * list assignment (`classify`'s centroid-literal projection — strictly
    * better than the hash-sample path's max_by aggregate, which exchanges
    * the corpus on its unique key) and (b) per-query probe lists (same
    * literal shape, `Clustering.probe`). Refinement moves centroids from
    * arbitrary sample points to density centers, which is what lifts
    * recall@10 at fixed nProbe (RecallSpec measures the delta); the model
    * stays k×dim doubles of driver state, so the 100 TB story is
    * unchanged — the fit's per-round cost is one corpus scan. */
  private def lloydAssignProbe(corpus: DataFrame, cId: Column, cVec: Column,
                               c: DataFrame, q: DataFrame, nLists: Int,
                               nProbe: Int, iters: Int,
                               replicas: Int = 1): (DataFrame, DataFrame) = {
    val model = Clustering.fit(corpus, cId, cVec, k = nLists, iters = iters)
    val assigned =
      if (replicas > 1) Clustering.probe(c, col("c_v"), model, replicas)
      else Clustering.classify(c, col("c_v"), model)
        .withColumnRenamed("cluster", "list_id").drop("csim")
    (assigned, Clustering.probe(q, col("q_v"), model, nProbe))
  }

  /** IVF-SQ8: IVF list pruning × int8-quantized scan — the other standard
    * composition next to `ivfPqTopK` (FAISS's IVF,SQ8 index class).
    * Per-vector int8 quantization keeps exact integer dot products (the
    * per-vector scale cancels in cosine), so unlike PQ-ADC the scan loses
    * NO ranking fidelity beyond the quantization itself, reads 1/4 of the
    * float bytes, and still prunes to nProbe/nLists of the rows.
    *
    * Plan shape: identical to ivfPqTopK's IVF side (broadcast centroids,
    * map-side-partial max_by assignment, collect_list probe selection);
    * the scan side ranks quantized integer dots over only the probed
    * lists. Quantization happens ONCE per vector on both sides — before
    * the probe explode on the query side. Everything is the shared
    * deterministic construction, so the composition stays fully
    * oracle-checked. */
  def ivfSq8TopK(queries: DataFrame, corpus: DataFrame, qId: Column,
                 qVec: Column, cId: Column, cVec: Column, k: Int,
                 nLists: Int = 16, nProbe: Int = 4,
                 refineIters: Int = 0, replicas: Int = 1): DataFrame = {
    require(replicas == 1 || refineIters > 0,
      "multi-assignment (replicas > 1) requires the Lloyd-refined path")
    val c = corpus.select(cId.as("n_id"), asDouble(cVec).as("c_v"))
      .withColumn("c_n", norm(col("c_v")))
    // query side quantizes BEFORE probe selection explodes it ×nProbe
    val q = queries.select(qId.as("q_id"), asDouble(qVec).as("q_v"))
      .withColumn("q_n", norm(col("q_v")))
      .withColumn("_s", int8Scale(col("q_v")))
      .withColumn("q_q", quantizeInt8(col("q_v"), col("_s"))
        .cast("array<double>"))
      .withColumn("qq_n", sqrt(dot(col("q_q"), col("q_q"))))
      .drop("_s")
    val (assigned0, probes) =
      if (refineIters > 0) lloydAssignProbe(corpus, cId, cVec, c, q,
        nLists, nProbe, refineIters, replicas)
      else {
        val centroids = ivfCentroids(c, nLists)
        (ivfAssign(c, centroids, Seq("c_v")),
          ivfProbes(q, centroids, nProbe, Seq("q_q", "qq_n")))
      }
    // quantize the stored vectors once (index-build cost): the scan
    // below reads ints only
    val assigned = assigned0
      .withColumn("_s", int8Scale(col("c_v")))
      .withColumn("c_q", quantizeInt8(col("c_v"), col("_s"))
        .cast("array<double>"))
      .withColumn("cq_n", sqrt(dot(col("c_q"), col("c_q"))))
      .drop("c_v", "c_n", "_s")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    val scored = assigned.join(broadcast(probes), Seq("list_id"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(dot(col("q_q"), col("c_q")) / (col("qq_n") * col("cq_n")), 4)
          .as("sim"))
    (if (replicas > 1) scored.dropDuplicates("q_id", "n_id") else scored)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rank"))
  }

  /** IVF-PQ: the production composition — IVF list pruning picks WHICH
    * vectors each query compares against (`nProbe`/`nLists` of the
    * corpus), PQ-ADC decides HOW each comparison is paid for (m code
    * lookups instead of a dim-float dot). Both index structures are the
    * shared deterministic constructions above, so the composition stays
    * fully oracle-checked.
    *
    * Plan shape: both index builds are broadcast-join + map-side-partial
    * aggregates over ONE corpus read each; the candidate set is an
    * equi-join on list_id (probes are |Q|*nProbe rows, broadcast), and
    * the ADC sum is one hash aggregate over candidates*m rows. The corpus
    * is never sorted, never windowed, never self-joined on raw vectors —
    * at 100 TB the scan reads nProbe/nLists of the rows and 1/32 of the
    * bytes per row. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, qId: Column,
                qVec: Column, cId: Column, cVec: Column, k: Int,
                nLists: Int = 16, nProbe: Int = 4,
                dim: Int = 64, m: Int = 8, ks: Int = 16,
                refineIters: Int = 0, replicas: Int = 1): DataFrame = {
    require(dim % m == 0, "m must divide dim")
    require(replicas == 1 || refineIters > 0,
      "multi-assignment (replicas > 1) requires the Lloyd-refined path")
    val sub = dim / m
    val c = corpus.select(cId.as("n_id"), asDouble(cVec).as("c_v"))
      .withColumn("c_n", norm(col("c_v")))
    val q = queries.select(qId.as("q_id"), asDouble(qVec).as("q_v"))
      .withColumn("q_n", norm(col("q_v")))
    // --- IVF side: centroids + list assignment (shared construction) ---
    val (assigned, probes) =
      if (refineIters > 0) {
        val (a, p) = lloydAssignProbe(corpus, cId, cVec, c, q,
          nLists, nProbe, refineIters, replicas)
        (a.select(col("n_id"), col("list_id")),
          p.select(col("q_id"), col("list_id")))
      } else {
        val centroids = ivfCentroids(c, nLists)
        (ivfAssign(c, centroids, Nil),
          ivfProbes(q, centroids, nProbe, Nil))
      }

    // --- PQ side: shared codebook / corpus codes / query tables ---
    val cb = pqCodebook(c, m, sub, ks)
    val codes = pqEncode(c, cb, m, sub)
    val qTab = pqQueryTable(q.select(col("q_id"), col("q_v")), cb, m, sub)

    // --- compose: prune candidates by probed list, then ADC over codes.
    // Multi-assignment stores each vector in `replicas` lists, so the
    // same (q, n) pair can surface via several lists — dedup BEFORE the
    // ADC join, or the groupBy would sum the pair's code rows twice
    val cand0 = assigned.join(broadcast(probes), Seq("list_id"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"))
    val cand = if (replicas > 1) cand0.dropDuplicates("q_id", "n_id")
      else cand0
    val adc = cand.join(codes, Seq("n_id"))
      .join(broadcast(qTab.withColumnRenamed("j", "code")),
        Seq("q_id", "sub", "code"))
      .groupBy(col("q_id"), col("n_id"))
      .agg(round(sum(col("qdi")) / 1e6, 6).as("adist"))
    pqRank(adc, k)
  }

  // ------------------------------------------------------ exact re-rank

  /** Exact-cosine re-rank of an ANN candidate pool — the refine stage of
    * a two-stage retrieval pipeline (Jégou et al., ICASSP 2011's IVFADC+R;
    * FAISS's `IndexRefineFlat`): a cheap approximate index nominates
    * `pool` candidates per query, then ONLY those candidates pay an exact
    * dot product against the raw vectors, and the final top-k ranks by
    * exact cosine. Recall stops being bounded by the quantizer's ranking
    * fidelity (PQ-ADC's ceiling is ~.10 here) and becomes the pool's
    * CONTAINMENT rate — "was the true neighbor nominated at all" — which
    * a modest pool already satisfies (RecallSpec pins the measured
    * floors). Exact-distance cost is |Q|·pool, independent of corpus
    * size, so the 100 TB read path is: quantized scan prunes, exact math
    * touches only what survived.
    *
    * Plan shape: `cand` is |Q|·pool rows → broadcast into a hash join
    * against the corpus raw vectors (a lookup, never a corpus shuffle);
    * the query side broadcasts as everywhere else; the only window is the
    * final per-query top-k over |Q|·pool scored rows. */
  def rerankExact(cand: DataFrame, queries: DataFrame, corpus: DataFrame,
                  qId: Column, qVec: Column, cId: Column, cVec: Column,
                  k: Int): DataFrame = {
    val q = queries.select(qId.as("q_id"), asDouble(qVec).as("q_v"))
      .withColumn("q_n", norm(col("q_v")))
    val c = corpus.select(cId.as("n_id"), asDouble(cVec).as("c_v"))
      .withColumn("c_n", norm(col("c_v")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    c.join(broadcast(cand.select(col("q_id"), col("n_id"))), Seq("n_id"))
      .join(broadcast(q), Seq("q_id"))
      .select(col("q_id"), col("n_id"),
        round(dot(col("q_v"), col("c_v")) / (col("q_n") * col("c_n")), 4)
          .as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rank"))
  }

  /** PQ-ADC candidate generation + exact re-rank: the ADC scan keeps its
    * 32× byte compression and nominates `pool` per query; `rerankExact`
    * restores exact-cosine ranking over just those. Same deterministic
    * constructions as `pqTopK`, so the whole two-stage pipeline stays
    * DuckDB-replayable and oracle-checked. */
  def pqRerankTopK(queries: DataFrame, corpus: DataFrame, qId: Column,
                   qVec: Column, cId: Column, cVec: Column, k: Int,
                   dim: Int = 64, m: Int = 8, ks: Int = 16,
                   pool: Int = 40): DataFrame =
    rerankExact(
      pqTopK(queries, corpus, qId, qVec, cId, cVec, pool, dim, m, ks),
      queries, corpus, qId, qVec, cId, cVec, k)

  /** IVF-PQ + exact re-rank — the full production read path at 100 TB:
    * Lloyd-refined list pruning reads nProbe/nLists of the rows, PQ-ADC
    * pays m byte-lookups per survivor, and exact math touches only the
    * final `pool` rows per query. */
  def ivfPqRerankTopK(queries: DataFrame, corpus: DataFrame, qId: Column,
                      qVec: Column, cId: Column, cVec: Column, k: Int,
                      nLists: Int = 16, nProbe: Int = 4, dim: Int = 64,
                      m: Int = 8, ks: Int = 16, refineIters: Int = 0,
                      pool: Int = 40, replicas: Int = 1): DataFrame =
    rerankExact(
      ivfPqTopK(queries, corpus, qId, qVec, cId, cVec, pool, nLists,
        nProbe, dim, m, ks, refineIters, replicas),
      queries, corpus, qId, qVec, cId, cVec, k)

  // ---------------------------------------------------------------- PCA

  /** Driver-resident PCA model — the k-means shape: k·d + d doubles, a
    * broadcast-literal-sized object, never the data. */
  final case class PcaModel(mean: Array[Double],
                            components: Array[Array[Double]],
                            eigenvalues: Array[Double])

  /** One-scan raw-moment entries for mean + covariance: per row, d
    * `(i, -1, v_i)` mean entries and d(d+1)/2 `(i, j, v_i·v_j)` upper-
    * triangle cross entries, aggregated by (i, j). Output volume is
    * MODEL-scale (d + d(d+1)/2 rows); shuffle volume is partitions ×
    * entries thanks to map-side partial aggregation — the corpus never
    * moves. Dimension is read per-row (`size(v)`), no driver probe. */
  private def momentAgg(v: DataFrame): DataFrame =
    // one NATIVE pass per row (graft.functions.VectorMoments): the
    // composed nested transform/flatten form evaluated two interpreted
    // lambda levels per element (~2,100 closures per 64-dim row) and
    // dominated the emb_pca_* family's wall; values are identical
    // (same products, same order — property-pinned)
    v.select(explode(
        graft.functions.HashExpressions.vectorMoments(col("v"))).as("e"))
      .groupBy(col("e.i").as("i"), col("e.j").as("j"))
      .agg(sum(col("e.x")).as("s"), count(lit(1)).as("c"))

  /** Covariance matrix as a DataFrame `(i, j, cov)` (upper triangle,
    * i <= j) — the oracle-checkable half of PCA: everything after this is
    * an eigendecomposition of a d×d driver matrix. Means and the corpus
    * count join back as broadcast model-scale tables. */
  def pcaCov(emb: DataFrame, vec: Column, decimals: Int = 6): DataFrame = {
    // persist the MODEL-scale aggregate: it is referenced twice below
    // (mean side + cross side) and an unpersisted plan would re-scan the
    // corpus once per reference
    val moments = Caches.persist(
      momentAgg(emb.select(asDouble(vec).as("v"))))
    val mean = moments.filter(col("j") === -1)
      .select(col("i"), (col("s") / col("c")).as("m"))
    moments.filter(col("j") >= 0)
      .join(broadcast(mean.select(col("i"), col("m").as("m_i"))), Seq("i"))
      .join(broadcast(mean.select(col("i").as("j"), col("m").as("m_j"))),
        Seq("j"))
      .select(col("i"), col("j"),
        // + 0.0 canonicalizes IEEE negative zero: a tiny negative
        // covariance rounds to -0.0 in one engine and 0.0 in the other
        (round(col("s") / col("c") - col("m_i") * col("m_j"), decimals)
          + lit(0.0)).as("cov"))
  }

  /** Fit PCA: the moment aggregate collects MODEL-scale rows
    * (d + d(d+1)/2), the covariance eigendecomposes on the driver by
    * cyclic Jacobi rotations (symmetric d×d — exact for this size, no
    * linear-algebra dependency), eigenpairs sort by eigenvalue
    * descending and each vector is sign-canonicalized (largest-|·|
    * component positive) so the model is deterministic. */
  def pcaFit(emb: DataFrame, vec: Column, k: Int): PcaModel = {
    val rows = momentAgg(emb.select(asDouble(vec).as("v"))).collect()
    require(rows.nonEmpty, "pcaFit needs a non-empty embedding corpus")
    val d = rows.iterator.map(_.getInt(0)).max + 1
    require(k >= 1 && k <= d, s"k=$k out of range for dim $d")
    fitFromMoments(rows, d, k)
  }

  /** `pcaFit` keeping ALL d components (the dimension is read from the
    * data): the full orthonormal eigenbasis — what a rotation consumer
    * (`pqRotation`, the Parseval energy check) needs. */
  def pcaFitFull(emb: DataFrame, vec: Column): PcaModel = {
    val rows = momentAgg(emb.select(asDouble(vec).as("v"))).collect()
    require(rows.nonEmpty, "pcaFit needs a non-empty embedding corpus")
    val d = rows.iterator.map(_.getInt(0)).max + 1
    fitFromMoments(rows, d, d)
  }

  private def fitFromMoments(rows: Array[org.apache.spark.sql.Row],
                             d: Int, k: Int): PcaModel = {
    val n = rows.find(r => r.getInt(1) == -1).map(_.getLong(3))
      .getOrElse(throw new IllegalArgumentException(
        "pcaFit needs a non-empty embedding corpus")).toDouble
    val mean = Array.ofDim[Double](d)
    val raw = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val (i, j, s) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      if (j == -1) mean(i) = s / n
      else { raw(i)(j) = s / n; raw(j)(i) = s / n }
    }
    val cov = Array.tabulate(d, d)((i, j) => raw(i)(j) - mean(i) * mean(j))
    val (vals, vecs) = jacobiEigen(cov)
    PcaModel(mean, vecs.take(k), vals.take(k))
  }

  /** Project onto the model's components: `k` codegen'd dot products per
    * row against literal arrays, the centered term folded into a scalar
    * offset (`(v-m)·w = v·w - m·w`). Zero shuffle, zero join — classify
    * works identically on streams.
    *
    * `whiten` divides each coordinate by sqrt(eigenvalue) (ZCA-style
    * per-axis variance normalization — unit variance per output
    * dimension, the conventional input to downstream quantizers and
    * distance metrics that assume isotropy). Components with vanishing
    * variance (eigenvalue below `1e-12` of the leading one) whiten to
    * zero rather than exploding a noise axis. */
  def pcaProject(vec: Column, model: PcaModel, decimals: Int = 6,
                 whiten: Boolean = false): Column =
    array(model.components.zipWithIndex.map { case (w, c) =>
      val offset = w.zip(model.mean).map { case (a, b) => a * b }.sum
      // one Literal per component row, not dim lit nodes (§4, round 17)
      val raw = dot(asDouble(vec), typedlit(w.toIndexedSeq)) - offset
      val scaled = if (!whiten) raw else {
        val l = model.eigenvalues(c)
        val floor = 1e-12 * math.max(model.eigenvalues.headOption
          .getOrElse(0.0), java.lang.Double.MIN_NORMAL)
        if (l <= floor) lit(0.0) else raw / math.sqrt(l)
      }
      round(scaled, decimals)
    }.toIndexedSeq: _*)

  /** Deterministic ±1 entry of the Johnson–Lindenstrauss sign matrix —
    * a closed-form integer parity both engines evaluate identically
    * (Achlioptas, JCSS 2003: ±1 entries satisfy the JL lemma with the
    * same distortion bound as Gaussians). `i` is the 1-based input
    * dimension, `j` the 0-based output dimension.
    *
    * The sign is the parity of an md5 bucket of "rp:i:j" — the house
    * cross-engine hash idiom (sample_split), NOT a cheap linear-
    * congruential parity: LCG parities over a small index domain
    * produce constant or pairwise-near-identical rows (measured 56/64
    * alignment between two rows of a mod-103 LCG — an effectively
    * rank-deficient projection). The md5 rows measure ≤14/64 cross-
    * alignment and 29–38/64 balance; SimilaritySpec pins both. The
    * matrix is k×d literals computed once at plan build — nothing is
    * hashed per row. */
  def rpSign(i: Int, j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"rp:$i:$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2 == 0) 1.0
    else -1.0
  }

  /** Johnson–Lindenstrauss random projection to `k` dims: per output dim
    * one dot product against a ±1 sign row, rounded. Unlike `pcaProject`
    * there is NO fit pass at all — the matrix is a formula, so the
    * operator is a pure map over the corpus: zero shuffles, zero driver
    * state, zero model to ship, which is the 100 TB trade against PCA's
    * d×d covariance aggregate (JL preserves pairwise distances within
    * 1±ε at k = O(log n / ε²) but finds no axes of variance). Scaling by
    * 1/√k is left to the caller so stored coords stay ±1-weighted sums. */
  def rpProject(vec: Column, dim: Int, k: Int, decimals: Int = 6): Column =
    array((0 until k).map { j =>
      val signs = array((1 to dim).map(i => lit(rpSign(i, j))): _*)
      round(dot(asDouble(vec), signs), decimals)
    }.toIndexedSeq: _*)

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: rotate away
    * the largest off-diagonal mass sweep by sweep until it vanishes
    * (quadratic convergence; a handful of sweeps at d=64). Returns
    * (eigenvalues desc, matching unit eigenvectors, sign-canonical). */
  private def jacobiEigen(src: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = src.length
    val a = src.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = i + 1
        while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    // convergence is RELATIVE to the matrix's own scale (Frobenius norm):
    // an absolute cutoff would declare tiny-valued covariances (e.g.
    // pre-normalized embeddings, entries ~1e-14) "converged" after zero
    // sweeps and return coordinate axes instead of eigenvectors, while
    // large-valued ones would always burn every sweep
    val fro2 = {
      var s = 0.0
      var i = 0
      while (i < d) { var j = 0
        while (j < d) { s += src(i)(j) * src(i)(j); j += 1 }; i += 1 }
      s
    }
    var sweep = 0
    while (sweep < 64 && off() > 1e-24 * fro2) {
      for (p <- 0 until d - 1; q <- p + 1 until d
           if math.abs(a(p)(q)) > 1e-300) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1))
                else 1.0 / (theta - math.sqrt(theta * theta + 1))
        val c = 1.0 / math.sqrt(t * t + 1)
        val s = t * c
        var i = 0
        while (i < d) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - s * aiq
          a(i)(q) = s * aip + c * aiq
          i += 1
        }
        i = 0
        while (i < d) {
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = c * api - s * aqi
          a(q)(i) = s * api + c * aqi
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq
          v(i)(q) = s * vip + c * viq
          i += 1
        }
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { c =>
      val col = Array.tabulate(d)(r => v(r)(c))
      val dom = col.indices.maxBy(i => math.abs(col(i)))
      if (col(dom) < 0) col.map(x => -x) else col
    }.toArray
    (vals, vecs)
  }

  /** OPQ rotation, the parametric variant (Ge et al., CVPR 2013 §4 —
    * "OPQ-P"): rotate vectors into the PCA eigenbasis and ALLOCATE the
    * principal components to the `m` PQ subspaces so the per-subspace
    * variance PRODUCTS balance (greedy: eigenvalues descending, each to
    * the not-full bucket with the smallest log-product). Balanced
    * subspace information is the condition under which PQ's independent
    * per-subspace quantizers waste the least — the closed-form
    * alternative to the paper's alternating Procrustes loop, fit
    * entirely with the existing moment-aggregate + Jacobi machinery
    * (one corpus scan, d×d driver eigensolve).
    *
    * Returns the d×d orthogonal rotation as rows; subspace `j` of the
    * rotated vector is rows [j·d/m, (j+1)·d/m). Apply with `rotateVec`
    * — rotation preserves dot products and norms, so exact cosine
    * ranking is unchanged and ONLY quantization fidelity moves. */
  def pqRotation(emb: DataFrame, vec: Column,
                 m: Int = 8): Array[Array[Double]] = {
    val model = pcaFitFull(emb, vec)
    val d = model.components.length
    require(d % m == 0, s"m=$m must divide dim $d")
    val cap = d / m
    val logs = Array.fill(m)(0.0)
    val alloc = Array.fill(m)(Vector.newBuilder[Int])
    val used = Array.fill(m)(0)
    model.eigenvalues.zipWithIndex.foreach { case (lam, i) =>
      val j = (0 until m).filter(used(_) < cap).minBy(logs(_))
      alloc(j) += i
      used(j) += 1
      logs(j) += math.log(math.max(lam, 1e-300))
    }
    alloc.flatMap(_.result().map(model.components)).toArray
  }

  /** Apply a rotation matrix (rows) to a vector column: one codegen'd
    * literal-array dot product per output coordinate — zero shuffle,
    * zero join, streams as-is. 12 decimals keep the rounding noise far
    * below any quantization-error or ranking margin. */
  def rotateVec(vec: Column, rotation: Array[Array[Double]],
                decimals: Int = 12): Column =
    // one Literal per rotation row, not dim² lit nodes (§4, round 17):
    // the former per-element form put ~4096 expression nodes into every
    // OPQ plan — visible as driver planning/codegen time, not task time
    array(rotation.map(w =>
      round(dot(asDouble(vec), typedlit(w.toIndexedSeq)),
        decimals)).toIndexedSeq: _*)

  /** Mean PQ reconstruction error (sum over subspaces of the squared
    * distance to the NEAREST codeword, averaged over the corpus) — the
    * quantity OPQ minimizes and the direct fidelity measure behind ADC
    * ranking quality. Same deterministic hash-sampled codebook as
    * `pqTopK`, so `pqQuantizationError(c, id, rotateVec(v, R)) <
    * pqQuantizationError(c, id, v)` isolates exactly the rotation's
    * contribution. One corpus scan + two aggregates. */
  def pqQuantizationError(corpus: DataFrame, cId: Column, cVec: Column,
                          dim: Int = 64, m: Int = 8,
                          ks: Int = 16): Double = {
    require(dim % m == 0, "m must divide dim")
    val sub = dim / m
    val c = corpus.select(cId.as("n_id"), asDouble(cVec).as("c_v"))
    val cb = pqCodebook(c, m, sub, ks)
    c.select(col("n_id"), explode(pqSubSlices(col("c_v"), m, sub)).as("e"))
      .select(col("n_id"), col("e.sub").as("sub"), col("e.sv").as("cs"))
      .join(broadcast(cb), Seq("sub"))
      .groupBy(col("n_id"), col("sub"))
      .agg(min(pqD2(col("cs"), col("cw"))).as("d2"))
      .groupBy(col("n_id")).agg(sum(col("d2")).as("err"))
      .agg(avg(col("err"))).head.getDouble(0)
  }

  /** Mean recall@k of an approximate top-k result against the exact one
    * — the retrieval-QUALITY measure the per-query determinism oracles
    * cannot see (they prove each index replays exactly, not that it
    * finds true neighbors). Per query: |approx ∩ exact| / |exact rows|
    * (the denominator is exact's own row count, ≤ k on small corpora),
    * averaged over exact's query set; a query the approximate index
    * returns nothing for counts as 0. Both inputs are the `(q_id, n_id,
    * ...)` frames every `*TopK` operator returns. One semi-join + two
    * query-set-scale aggregates; corpus never rescanned. */
  def recallAtK(approx: DataFrame, exact: DataFrame): Double = {
    val a = approx.select(col("q_id"), col("n_id"))
    val hits = exact.select(col("q_id"), col("n_id"))
      .join(a, Seq("q_id", "n_id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("hits"))
    exact.groupBy(col("q_id")).agg(count(lit(1)).as("n"))
      .join(hits, Seq("q_id"), "left")
      .agg(avg(coalesce(col("hits"), lit(0L)) / col("n")))
      .head.getDouble(0)
  }

  // -------------------------------------------- persisted IVF index

  /** Content fingerprint of an on-disk source table for keying a
    * persisted index directory: md5 over the canonical path plus every
    * file's (relative name, size, mtime), hex-truncated to 16 chars.
    * Pure filesystem metadata — no data scan, so deciding cache reuse
    * costs nothing at any corpus size — yet regenerating the table at
    * the SAME path changes sizes/mtimes and therefore the key, forcing
    * a rebuild (a path-hash key would silently serve the stale index;
    * hash collisions across dirs can't cross-contaminate because the
    * canonical path is inside the digest). */
  def dataFingerprint(dataPath: String): String = {
    val root = new java.io.File(dataPath).getCanonicalFile
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .sortBy(_.getName).toSeq.flatMap(walk)
      else Seq(f)
    val sig = (root.getPath +: walk(root).map(f =>
      s"${root.toPath.relativize(f.toPath)}|${f.length}|${f.lastModified}"))
      .mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(16)
  }

  /** The offline-build / online-serve split for IVF — the piece every
    * in-memory `ivfTopK` call leaves on the table at 100 TB: rebuilding
    * the index per query batch re-scans the corpus, while a PERSISTED
    * index is built once and every subsequent batch reads only the
    * probed fraction. `buildIvfIndex` writes the assigned corpus
    * `partitionBy(list_id)` (plus the tiny centroid model as its own
    * parquet), so serving gets STATIC partition pruning: the probed
    * list union — bounded by nLists, computed from the driver-resident
    * model — lands in the scan as a PartitionFilter and unprobed list
    * directories are never opened (plan-audited). The reference's
    * offline/online split precedent in this repo: the BPE frozen merge
    * table and `Clustering.fit`/`classify`.
    *
    * Layout under `indexDir`: `corpus/list_id=N/…` (n_id, c_v, c_n) and
    * `model/` (cluster, components, norm). Both deterministic, so a
    * rebuild is byte-stable and serve-after-reload equals
    * serve-after-build (spec-pinned). */
  def buildIvfIndex(corpus: DataFrame, cId: Column, cVec: Column,
                    indexDir: String, nLists: Int = 16,
                    refineIters: Int = 2, replicas: Int = 2): Unit = {
    val spark = corpus.sparkSession
    val model = Clustering.fit(corpus, cId, cVec, k = nLists,
      iters = refineIters)
    val c = corpus.select(cId.as("n_id"), asDouble(cVec).as("c_v"))
      .withColumn("c_n", norm(col("c_v")))
    val assigned =
      if (replicas > 1) Clustering.probe(c, col("c_v"), model, replicas)
      else Clustering.classify(c, col("c_v"), model)
        .withColumnRenamed("cluster", "list_id").drop("csim")
    assigned.write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$indexDir/corpus")
    import spark.implicits._
    model.map(m => (m.cluster, m.components, m.norm))
      .toDF("cluster", "components", "norm")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/model")
  }

  /** The centroid model back from disk (k×dim doubles — driver-resident
    * by design, same as a fresh `Clustering.fit`). */
  def loadIvfModel(spark: org.apache.spark.sql.SparkSession,
                   indexDir: String): Seq[Clustering.Centroid] =
    spark.read.parquet(s"$indexDir/model")
      .select(col("cluster"), col("components"), col("norm"))
      .collect()
      .map(r => Clustering.Centroid(r.getLong(0),
        r.getSeq[Double](1), r.getDouble(2)))
      .sortBy(_.cluster).toSeq

  /** Incremental index maintenance: assign NEW vectors under the
    * already-persisted (frozen) centroid model and append them to their
    * `list_id=` directories — no refit, no touch of existing objects.
    * This is how IVF deployments age in production (FAISS `add` after
    * `train`): daily embedding increments classify against the frozen
    * model — a zero-shuffle centroid-literal projection, so the call is
    * `foreachBatch`-safe for streaming ingest — and the model refits on
    * a cadence, not per increment. Drift contract: serving after
    * appends equals a scan of frozen-model assignments over the UNION
    * corpus (spec-pinned); recall under heavy drift is the re-fit
    * trigger, measured offline exactly like RecallSpec. */
  def appendToIvfIndex(spark: org.apache.spark.sql.SparkSession,
                       indexDir: String, newVectors: DataFrame,
                       cId: Column, cVec: Column,
                       replicas: Int = 2): Unit = {
    val model = loadIvfModel(spark, indexDir)
    val c = newVectors.select(cId.as("n_id"), asDouble(cVec).as("c_v"))
      .withColumn("c_n", norm(col("c_v")))
    val assigned =
      if (replicas > 1) Clustering.probe(c, col("c_v"), model, replicas)
      else Clustering.classify(c, col("c_v"), model)
        .withColumnRenamed("cluster", "list_id").drop("csim")
    assigned.select(col("n_id"), col("c_v"), col("c_n"), col("list_id"))
      .write.mode("append").partitionBy("list_id")
      .parquet(s"$indexDir/corpus")
  }

  /** Tombstone DELETE for the persisted IVF index — the missing verb of
    * the build/serve/append/compact lifecycle (GDPR erasure, licensing
    * takedowns, dedup-after-the-fact all hit a live index). Deletes are
    * LOGICAL: ids append to a `tombstones/` side table (distinct,
    * idempotent — re-deleting an id is a no-op by anti-join semantics),
    * serving anti-joins them out of the candidate pool, and the next
    * `compactIvfIndex` folds them into the rewrite and retires the
    * tombstone table. Nothing touches the `list_id=` data objects at
    * delete time — the delete is O(|ids|) regardless of index size,
    * exactly the FAISS `remove_ids`-deferred / Lucene delete-bitmap
    * discipline. Crash contract: tombstones surviving a crashed
    * compaction re-apply harmlessly (anti-join of already-removed
    * rows). */
  def deleteFromIvfIndex(indexDir: String, ids: DataFrame,
                         id: Column): Unit =
    ids.select(id.cast("long").as("n_id")).distinct()
      .write.mode("append").parquet(s"$indexDir/tombstones")

  /** The tombstone table if any deletes were ever issued. */
  private def ivfTombstones(spark: org.apache.spark.sql.SparkSession,
                            indexDir: String): Option[DataFrame] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(s"$indexDir/tombstones")
    val fs = org.apache.hadoop.fs.FileSystem.get(p.toUri,
      spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** Drop tombstoned rows from a served candidate frame (broadcast
    * anti-join — the tombstone table is id-only and tiny relative to
    * the index). */
  private def dropTombstoned(spark: org.apache.spark.sql.SparkSession,
                             indexDir: String,
                             cand: DataFrame): DataFrame =
    ivfTombstones(spark, indexDir) match {
      case Some(ts) => cand.join(
        broadcast(ts.select(col("n_id")).distinct()), Seq("n_id"),
        "left_anti")
      case None => cand
    }

  /** The STREAMING face of `appendToIvfIndex` — an exactly-once
    * per-micro-batch append for `foreachBatch`: a replayed batch (the
    * at-least-once delivery every streaming sink must survive) lands on
    * the SAME deterministic object names and overwrites byte-equivalent
    * content instead of duplicating rows — the ingest writer's X1
    * discipline applied to the index. Mechanics: the batch's frozen-
    * model assignment stages to a batch-keyed sibling dir (one
    * deterministic file per touched list: hash-routed, n_id-sorted),
    * then each staged file renames to
    * `corpus/list_id=N/append-b<batchId>.parquet` — overwrite-on-replay,
    * so a crash anywhere (before, during, or after the promote loop)
    * heals on the retry; a FULLY replayed batch is a byte-identical
    * no-op. Cost is the same |delta| × k centroid dots plus one
    * partitioned write — nothing about the persisted corpus layout or
    * serving changes. */
  def appendToIvfIndexExactlyOnce(spark: org.apache.spark.sql.SparkSession,
                                  indexDir: String, batch: DataFrame,
                                  cId: Column, cVec: Column, batchId: Long,
                                  replicas: Int = 2): Unit = {
    import org.apache.hadoop.fs.{FileSystem, Path}
    val model = loadIvfModel(spark, indexDir)
    val c = batch.select(cId.as("n_id"), asDouble(cVec).as("c_v"))
      .withColumn("c_n", norm(col("c_v")))
    val assigned =
      if (replicas > 1) Clustering.probe(c, col("c_v"), model, replicas)
      else Clustering.classify(c, col("c_v"), model)
        .withColumnRenamed("cluster", "list_id").drop("csim")
    val staged = s"$indexDir/append_staging_b$batchId"
    assigned.select(col("n_id"), col("c_v"), col("c_n"), col("list_id"))
      .repartition(col("list_id"))
      .sortWithinPartitions(col("list_id"), col("n_id"))
      .write.mode("overwrite").partitionBy("list_id").parquet(staged)
    val fs = FileSystem.get(new Path(indexDir).toUri,
      spark.sparkContext.hadoopConfiguration)
    val stagedPath = new Path(staged)
    fs.listStatus(stagedPath).filter(_.isDirectory).foreach { listDir =>
      val dest = new Path(s"$indexDir/corpus/${listDir.getPath.getName}")
      fs.mkdirs(dest)
      val parts = fs.listStatus(listDir.getPath)
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith("."))
        .sortBy(_.getPath.getName)
      // one hash-routed file per list; deterministic target name per
      // (batch, list) — a replayed batch overwrites, never appends
      parts.zipWithIndex.foreach { case (p, i) =>
        val target = new Path(dest,
          f"append-b$batchId%d-$i%03d.parquet")
        fs.delete(target, false)
        require(fs.rename(p.getPath, target),
          s"streaming append promote failed for $target")
      }
    }
    fs.delete(stagedPath, true)
  }

  /** Maintenance pass for a persisted IVF index that has been absorbing
    * frozen-model appends: every `appendToIvfIndex` lands one more file
    * set under each touched `list_id=` directory, so a daily-delta
    * deployment accumulates the classic small-files problem — the
    * serving scan's cost drifts from "rows in the probed lists" to
    * "file opens in the probed lists". Compaction rewrites the corpus
    * in ONE hash-partitioned pass (`repartition(list_id)` routes every
    * list to a single task → one file per list) and leaves the model
    * untouched; served results are identical because serving is a
    * deterministic function of the corpus ROWS, never their file
    * layout (spec-pinned: serve-before == serve-after, bit for bit).
    *
    * Crash safety: the rewrite stages to a sibling dir, then two
    * renames swap it in (old corpus parked, staging promoted, park
    * dropped). A crash between the renames leaves the parked copy; the
    * next call heals by restoring it before compacting. Returns
    * (files_before, files_after). */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession,
                      indexDir: String): (Long, Long) = {
    import org.apache.hadoop.fs.{FileSystem, Path}
    val corpus = new Path(s"$indexDir/corpus")
    val staged = new Path(s"$indexDir/corpus_compact_staging")
    val parked = new Path(s"$indexDir/corpus_compact_old")
    val fs = FileSystem.get(corpus.toUri,
      spark.sparkContext.hadoopConfiguration)
    // heal a crash window: corpus missing but the parked copy survives
    if (!fs.exists(corpus) && fs.exists(parked))
      require(fs.rename(parked, corpus), "compaction crash-heal failed")
    def dataFiles(p: Path): Long = {
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext) {
        val f = it.next().getPath.getName
        if (!f.startsWith("_") && !f.startsWith(".")) n += 1
      }
      n
    }
    val before = dataFiles(corpus)
    fs.delete(staged, true)
    // tombstones fold into the rewrite: the compacted index physically
    // drops deleted rows, then the tombstone table retires. A crash
    // after the promote but before the retire is safe — the surviving
    // tombstones anti-join already-absent rows at serve time.
    // Concurrent-delete safety: snapshot the tombstone FILE list
    // before the rewrite reads the table, and retire only those files
    // after the promote — a tombstone appended while the compaction
    // runs (e.g. by the streaming delete path) was not folded into the
    // rewrite, so it must survive to keep anti-joining at serve time.
    val tombDir = new Path(s"$indexDir/tombstones")
    val tombSnapshot: Array[Path] =
      if (fs.exists(tombDir))
        fs.listStatus(tombDir).map(_.getPath)
          .filter(p => !p.getName.startsWith("."))
      else Array.empty
    dropTombstoned(spark, indexDir, spark.read.parquet(corpus.toString))
      .repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id")
      .parquet(staged.toString)
    fs.delete(parked, true)
    require(fs.rename(corpus, parked), "compaction swap failed (park)")
    require(fs.rename(staged, corpus), "compaction swap failed (promote)")
    fs.delete(parked, true)
    tombSnapshot.foreach(p => fs.delete(p, true))
    // only late-arriving tombstones survive; if none did, drop the dir
    // so ivfTombstones' exists() gate doesn't read an empty table
    if (fs.exists(tombDir) &&
        fs.listStatus(tombDir).forall(s =>
          s.getPath.getName.startsWith("_") ||
          s.getPath.getName.startsWith(".")))
      fs.delete(tombDir, true)
    (before, dataFiles(corpus))
  }

  /** The offline/online split for IVF-PQ — the actual 100 TB serving
    * layout: the persisted index holds m CODE BYTES per vector (packed
    * as a sub-ordered array) partitioned by `list_id`, NOT the raw
    * floats, so the serving scan reads nProbe/nLists of the rows AND
    * 1/32 of the bytes while the raw vectors stay in the base corpus
    * table and are touched only by an exact re-rank pool
    * (`ivfPqRerankServe`). Construction is the shared deterministic
    * one (`Clustering.fit` centroids + md5-sampled codebook), so
    * serving equals the in-memory `ivfPqTopK(refineIters, replicas)`
    * bit-for-bit (spec-pinned) and stays fully oracle-checked.
    *
    * Layout under `indexDir`: `codes/list_id=N/…` (n_id, codes),
    * `codebook/` (sub, j, cw), `model/` (cluster, components, norm). */
  def buildIvfPqIndex(corpus: DataFrame, cId: Column, cVec: Column,
                      indexDir: String, nLists: Int = 16,
                      refineIters: Int = 2, replicas: Int = 2,
                      dim: Int = 64, m: Int = 8, ks: Int = 16): Unit = {
    require(dim % m == 0, "m must divide dim")
    val spark = corpus.sparkSession
    val sub = dim / m
    val model = Clustering.fit(corpus, cId, cVec, k = nLists,
      iters = refineIters)
    val c = corpus.select(cId.as("n_id"), asDouble(cVec).as("c_v"))
      .withColumn("c_n", norm(col("c_v")))
    val cb = pqCodebook(c, m, sub, ks)
    // pack each vector's m codes into ONE sub-ordered array row — the
    // scan-friendly shape (and 1/32 of the float bytes)
    val packed = pqEncode(c, cb, m, sub)
      .groupBy(col("n_id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("code"))))
        .as("cs"))
      .select(col("n_id"),
        transform(col("cs"), x => x.getField("code")).as("codes"))
    val assigned =
      if (replicas > 1) Clustering.probe(c, col("c_v"), model, replicas)
      else Clustering.classify(c, col("c_v"), model)
        .withColumnRenamed("cluster", "list_id").drop("csim")
    assigned.select(col("n_id"), col("list_id"))
      .join(packed, Seq("n_id"))
      .write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$indexDir/codes")
    cb.write.mode("overwrite").parquet(s"$indexDir/codebook")
    import spark.implicits._
    model.map(mm => (mm.cluster, mm.components, mm.norm))
      .toDF("cluster", "components", "norm")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/model")
  }

  /** ADC top-k against a persisted IVF-PQ index: probed-list static
    * partition pruning (the union is bounded by nLists, computed from
    * the driver-resident model) + per-candidate code-array explode into
    * the broadcast query distance table. Replica duplicates dedup
    * BEFORE the explode so no pair sums its code rows twice. */
  def ivfPqTopKServe(spark: org.apache.spark.sql.SparkSession,
                     indexDir: String, queries: DataFrame, qId: Column,
                     qVec: Column, k: Int, nProbe: Int = 4,
                     dim: Int = 64, m: Int = 8): DataFrame = {
    val sub = dim / m
    val model = loadIvfModel(spark, indexDir)
    val cb = spark.read.parquet(s"$indexDir/codebook")
    val q = queries.select(qId.as("q_id"), asDouble(qVec).as("q_v"))
      .withColumn("q_n", norm(col("q_v")))
    val qTab = pqQueryTable(q.select(col("q_id"), col("q_v")), cb, m, sub)
    val probes = Clustering.probe(q, col("q_v"), model, nProbe)
      .select(col("q_id"), col("list_id"))
    val probedLists = probes.select(col("list_id")).distinct()
      .collect().map(_.getLong(0)).sorted
    val idx = spark.read.parquet(s"$indexDir/codes")
      .filter(col("list_id").isin(probedLists: _*))
    val cand = idx.join(broadcast(probes), Seq("list_id"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), col("codes"))
      .dropDuplicates("q_id", "n_id")
    // per-query LUT instead of explode→join→re-aggregate: the full
    // distance table is only m·ks longs per query (128 at the
    // defaults), so it broadcasts as ONE array ordered by (sub, code)
    // and the ADC distance is m array lookups folded per candidate ROW
    // — the scan stays map-shaped with no (q,n,sub)-grain shuffle.
    // qdi values are exact integer micros, so the fold's sum order
    // cannot move the result vs the old groupBy sum (hash-identical).
    val lut = qTab
      .groupBy(col("q_id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("j"),
        col("qdi")))).as("t"))
      .select(col("q_id"),
        transform(col("t"), x => x.getField("qdi")).as("lut"))
    // ks derived IN-PLAN from the LUT length (m·ks entries) — no eager
    // count job on the serve path
    val ksN = (size(col("lut")) / lit(m)).cast("int")
    val adc = cand
      .join(broadcast(lut), Seq("q_id"))
      .select(col("q_id"), col("n_id"),
        // lut is (sub, j, qdi)-sorted with 0-based sub and 1-BASED
        // codeword id j, so (sub s, code c) sits at position s·ks + c
        round(aggregate(sequence(lit(0), lit(m - 1)), lit(0L),
          (acc, s) => acc + element_at(col("lut"),
            s * ksN + element_at(col("codes"), s + 1).cast("int")))
          .cast("double") / 1e6, 6).as("adist"))
    pqRank(adc, k)
  }

  /** Exact re-rank over the served ADC pool: the quantized index
    * nominates, the BASE corpus table pays raw-vector reads for pool
    * rows only — the complete production read path with the index and
    * the data physically separate. */
  def ivfPqRerankServe(spark: org.apache.spark.sql.SparkSession,
                       indexDir: String, queries: DataFrame,
                       corpus: DataFrame, qId: Column, qVec: Column,
                       cId: Column, cVec: Column, k: Int,
                       nProbe: Int = 4, pool: Int = 40,
                       dim: Int = 64, m: Int = 8): DataFrame =
    rerankExact(
      ivfPqTopKServe(spark, indexDir, queries, qId, qVec, pool, nProbe,
        dim, m),
      queries, corpus, qId, qVec, cId, cVec, k)

  /** Serve top-k against a persisted index. The probed-list UNION over
    * the query batch (≤ nLists values, from the driver-resident model)
    * filters the scan BEFORE the per-query probe join, so only probed
    * `list_id=` directories are read — the partition-pruning story the
    * in-memory path cannot have. Ranking semantics are identical to
    * `ivfTopK(refineIters, replicas)` over the same corpus (spec-pinned
    * equality), because the persisted assignment IS that construction. */
  def ivfTopKServe(spark: org.apache.spark.sql.SparkSession,
                   indexDir: String, queries: DataFrame, qId: Column,
                   qVec: Column, k: Int, nProbe: Int = 4): DataFrame = {
    val model = loadIvfModel(spark, indexDir)
    val q = queries.select(qId.as("q_id"), asDouble(qVec).as("q_v"))
      .withColumn("q_n", norm(col("q_v")))
    val probes = Clustering.probe(q, col("q_v"), model, nProbe)
    val probedLists = probes.select(col("list_id")).distinct()
      .collect().map(_.getLong(0)).sorted
    // tombstoned ids leave the candidate pool here (logical deletes —
    // the data objects are untouched until the next compaction)
    val idx = dropTombstoned(spark, indexDir,
      spark.read.parquet(s"$indexDir/corpus")
        .filter(col("list_id").isin(probedLists: _*)))
    topKExplode(
      idx.join(broadcast(probes), Seq("list_id"))
        .filter(col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("n_id"),
          round(dot(col("q_v"), col("c_v")) / (col("q_n") * col("c_n")), 4)
            .as("sim"))
        .dropDuplicates("q_id", "n_id"),
      k)
  }

  /** Hard-negative mining for contrastive training data: for each query
    * vector, the top-k most-similar corpus vectors whose label DIFFERS
    * from the query's — the "confusable but wrong" examples an embedding
    * trainer wants as negatives (same-label neighbors are useless as
    * negatives no matter how close they score).
    *
    * Same plan shape as `bruteForceTopK` (query side broadcasts, the
    * corpus never shuffles) with the label inequality folded into the
    * broadcast-join condition, so different-label filtering happens
    * BEFORE scoring: a same-label pair never pays its dot product.
    * At 100 TB the nomination stage would ride any of the ANN indexes
    * (IVF/PQ/serve) with this same per-pair label predicate applied to
    * the candidate pool — the predicate composes with every nominator
    * because it is a plain join filter. */
  def hardNegativesTopK(queries: DataFrame, corpus: DataFrame,
                        qId: Column, qVec: Column, qLabel: Column,
                        cId: Column, cVec: Column, cLabel: Column,
                        k: Int): DataFrame =
    labelTopK(queries, corpus, qId, qVec, qLabel, cId, cVec, cLabel, k,
      sameLabel = false)

  /** The label-predicate top-k both contrastive directions share:
    * `sameLabel = true` ranks same-label neighbors (positives),
    * `false` different-label ones (hard negatives). */
  def labelTopK(queries: DataFrame, corpus: DataFrame,
                qId: Column, qVec: Column, qLabel: Column,
                cId: Column, cVec: Column, cLabel: Column,
                k: Int, sameLabel: Boolean): DataFrame = {
    val q = queries.select(qId.as("q_id"), asDouble(qVec).as("q_v"),
        qLabel.as("q_label"))
      .withColumn("q_n", norm(col("q_v")))
    val c = corpus.select(cId.as("n_id"), asDouble(cVec).as("c_v"),
        cLabel.as("n_label"))
      .withColumn("c_n", norm(col("c_v")))
    val labelPred =
      if (sameLabel) col("q_label") === col("n_label")
      else col("q_label") =!= col("n_label")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    c.join(broadcast(q), col("q_id") =!= col("n_id") && labelPred)
      .select(col("q_id"), col("q_label"), col("n_id"), col("n_label"),
        round(dot(col("q_v"), col("c_v")) / (col("q_n") * col("c_n")), 4)
          .as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("q_label"), col("n_id"), col("n_label"),
        col("sim"), col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * merge two retrieval systems' rankings without score calibration —
    * rrf(d) = Σ_systems 1/(kRrf + rank_s(d)). The standard way to fuse
    * sparse (BM25) and dense (ANN) retrieval into one hybrid ranking,
    * since BM25 scores and cosine similarities live on incomparable
    * scales but ranks always compose.
    *
    * Inputs are the two systems' top-pool tables as `(q_id, id, rank)`.
    * The fusion is ONE full-outer equi-join on (q_id, id) — volume is
    * queries × pool per side, never corpus-scale, so at 100 TB the cost
    * lives entirely in the upstream retrievers (each already index-
    * backed). A per-(q,d) score needs no aggregate: with two systems the
    * sum is a fixed-order two-term expression, deterministic across
    * engines (an unordered float SUM over a group would not be). */
  def rrfFuse(sparse: DataFrame, dense: DataFrame, k: Int,
              kRrf: Int = 60): DataFrame = {
    val l = sparse.select(col("q_id"), col("id"),
      col("rank").cast("long").as("rank_a"))
    val r = dense.select(col("q_id"), col("id"),
      col("rank").cast("long").as("rank_b"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf").desc, col("id"))
    l.join(r, Seq("q_id", "id"), "full_outer")
      .select(col("q_id"), col("id"),
        round(
          coalesce(lit(1.0) / (lit(kRrf) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("rank_b")), lit(0.0)),
          6).as("rrf"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("id"), col("rrf"), col("rank"))
  }

  /** Maximal-marginal-relevance diversified top-k (Carbonell & Goldstein,
    * SIGIR 1998): greedily select k results where each pick maximizes
    * `lambda·sim(q,d) − mu·max_{s∈selected} sim(d,s)` — relevance minus
    * redundancy. The curation use: a near-dup-heavy corpus's plain top-k
    * returns k copies of one document; MMR returns k DIFFERENT ones.
    *
    * Plan: nominate a `pool`-sized candidate set per query (brute here;
    * any ANN nominator composes), compute the pool's pairwise cosine
    * matrix (queries × pool² rows — pool is a constant, so this is
    * queries-scale, NOT corpus-scale), then run k−1 greedy rounds, each
    * one join + two aggregates over the candidate frame. The corpus is
    * touched only by the nominator; every greedy round is bounded by
    * queries × pool rows regardless of corpus size.
    *
    * Determinism (the oracle replays every round in a recursive CTE):
    * pool sims round to 4 decimals; the marginal score rounds to 6; the
    * per-round argmax breaks ties on the smaller id. `lambda`/`mu` are
    * passed separately (not `1−lambda`) so both engines parse the exact
    * same double literals. */
  def mmrTopK(queries: DataFrame, corpus: DataFrame, qId: Column,
              qVec: Column, cId: Column, cVec: Column, k: Int,
              pool: Int = 20, lambda: Double = 0.7, mu: Double = 0.3)
      : DataFrame =
    mmrRerank(
      bruteForceTopK(queries, corpus, qId, qVec, cId, cVec, pool),
      corpus, cId, cVec, k, lambda, mu)

  /** MMR over an EXTERNALLY nominated candidate frame `(q_id, n_id,
    * sim)` — the greedy stage only consumes ids and rounded sims, so any
    * nominator composes (brute via `mmrTopK`, IVF/PQ/served via their
    * top-k directly). The pool's pairwise redundancy matrix joins the
    * corpus by candidate id — queries × pool rows hit the corpus, never
    * the reverse. */
  def mmrRerank(cand0: DataFrame, corpus: DataFrame, cId: Column,
                cVec: Column, k: Int, lambda: Double = 0.7,
                mu: Double = 0.3): DataFrame = {
    val firstW = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    val cand = Caches.persist(
      cand0.select(col("q_id"), col("n_id"), col("sim"))
        .withColumn("rank", row_number().over(firstW)))
    val vecs = corpus.select(cId.as("n_id"), asDouble(cVec).as("v"))
      .withColumn("nn", norm(col("v")))
    val cv = cand.select(col("q_id"), col("n_id"), col("sim"))
      .join(vecs, Seq("n_id"))
    val pa = cv.select(col("q_id"), col("n_id").as("a"),
      col("v").as("av"), col("nn").as("an"))
    val pb = cv.select(col("q_id"), col("n_id").as("b"),
      col("v").as("bv"), col("nn").as("bn"))
    val ps = Caches.persist(pa.join(pb, Seq("q_id"))
      .filter(col("a") =!= col("b"))
      .select(col("q_id"), col("a"), col("b"),
        round(dot(col("av"), col("bv")) / (col("an") * col("bn")), 4)
          .as("s")))
    var sel = cand.filter(col("rank") === 1)
      .select(col("q_id"), col("n_id"), lit(1L).as("step"))
    for (stepNo <- 2 to k) {
      // max pairwise sim from each remaining candidate to the selected set
      val msim = ps.join(
          broadcast(sel.select(col("q_id"), col("n_id").as("b"))),
          Seq("q_id", "b"))
        .groupBy(col("q_id"), col("a")).agg(max(col("s")).as("msim"))
        .withColumnRenamed("a", "n_id")
      val pickW = Window.partitionBy(col("q_id"))
        .orderBy(col("score").desc, col("n_id"))
      val pick = cand
        .join(broadcast(sel.select(col("q_id"), col("n_id"))),
          Seq("q_id", "n_id"), "left_anti")
        .join(msim, Seq("q_id", "n_id"))
        .select(col("q_id"), col("n_id"),
          round(lit(lambda) * col("sim") - lit(mu) * col("msim"), 6)
            .as("score"))
        .withColumn("rn", row_number().over(pickW))
        .filter(col("rn") === 1)
        .select(col("q_id"), col("n_id"), lit(stepNo.toLong).as("step"))
      sel = sel.union(pick).localCheckpoint()
    }
    sel.join(cand.select(col("q_id"), col("n_id"), col("sim")),
        Seq("q_id", "n_id"))
      .select(col("q_id"), col("step").as("rank"), col("n_id"), col("sim"))
  }
}
