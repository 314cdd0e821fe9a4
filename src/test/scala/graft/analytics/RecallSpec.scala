package graft.analytics

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Retrieval QUALITY of the ANN indexes, measured as recall@10 against
  * brute force at sf0.1 (2000 × 64-dim vectors, 20 queries) — the axis
  * the determinism oracles cannot see. Floors are set ~5 points under
  * the measured values (table in SCALE.md §ANN recall) so a silent
  * recall regression (broken banding, bad centroids, a quantizer that
  * stopped separating) fails CI while run-to-run noise does not: every
  * index here is deterministic, so the only variation across runs is a
  * code change.
  *
  * The ordering invariants matter as much as the absolute floors:
  * multi-probe must dominate single-probe (its candidate set is a
  * superset by construction), and the IVF family must beat its own
  * quantized variants' floors only where quantization actually loses
  * information (SQ8 ≈ exact, PQ lossy).
  */
class RecallSpec extends SparkSuite {

  private lazy val emb =
    graft.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
  private lazy val queries = emb.filter(col("vec_id") % 100 === 0)
  private lazy val exact = Caches.persist(Similarity.bruteForceTopK(
    queries, emb, col("vec_id"), col("embedding"),
    col("vec_id"), col("embedding"), k = 10))

  private def recallOf(name: String,
                       approx: org.apache.spark.sql.DataFrame,
                       floor: Double): Double = {
    val r = Similarity.recallAtK(approx, exact)
    info(f"$name%-12s recall@10 = $r%.3f (floor $floor%.2f)")
    assert(r >= floor,
      f"$name recall@10 regressed: $r%.3f < floor $floor%.2f")
    r
  }

  test("recall@10 floors at sf0.1 for every ANN index, with the " +
    "structural orderings (multi-probe ≥ single-probe, SQ8 ≈ IVF)") {
    val (id, v) = (col("vec_id"), col("embedding"))
    val srp = recallOf("srp",
      Similarity.srpTopK(queries, emb, id, v, id, v, k = 10), 0.60)
    val srpMp = recallOf("srp_mp",
      Similarity.srpMultiProbeTopK(queries, emb, id, v, id, v, k = 10),
      0.85)
    val srpMp2 = recallOf("srp_mp2",
      Similarity.srpMultiProbeTopK(queries, emb, id, v, id, v, k = 10,
        flips = 2), 0.90)
    val ivf = recallOf("ivf",
      Similarity.ivfTopK(queries, emb, id, v, id, v, k = 10), 0.40)
    val ivfLl = recallOf("ivf_lloyd",
      Similarity.ivfTopK(queries, emb, id, v, id, v, k = 10,
        refineIters = 2, replicas = 2), 0.75)
    val ivfSqLl = recallOf("ivf_sq8_ll",
      Similarity.ivfSq8TopK(queries, emb, id, v, id, v, k = 10,
        refineIters = 2, replicas = 2), 0.75)
    val ivfPqLl = recallOf("ivf_pq_ll",
      Similarity.ivfPqTopK(queries, emb, id, v, id, v, k = 10,
        refineIters = 2), 0.02)
    val ivf8 = recallOf("ivf_p8",
      Similarity.ivfTopK(queries, emb, id, v, id, v, k = 10, nProbe = 8),
      0.70)
    val ivfSq = recallOf("ivf_sq8",
      Similarity.ivfSq8TopK(queries, emb, id, v, id, v, k = 10), 0.40)
    val pq = recallOf("pq",
      Similarity.pqTopK(queries, emb, id, v, id, v, k = 10), 0.05)
    val ivfPq = recallOf("ivf_pq",
      Similarity.ivfPqTopK(queries, emb, id, v, id, v, k = 10), 0.02)
    val int8 = recallOf("int8",
      Similarity.int8TopK(queries, emb, id, v, id, v, k = 10), 0.90)
    val pq64 = recallOf("pq_ks64",
      Similarity.pqTopK(queries, emb, id, v, id, v, k = 10, ks = 64),
      0.12)
    // Exact re-rank (measured grid, 2026-08: defaults .25 / pool=100
    // .425 / ks=64+pool=200 .815; ivfpq: defaults .27, ks64+p200 the
    // registered config): the quantizer stops being the RANKER and
    // becomes a mere NOMINATOR — recall@10 is pool containment.
    val pqRr = recallOf("pq_rerank",
      Similarity.pqRerankTopK(queries, emb, id, v, id, v, k = 10), 0.20)
    val pqRr100 = recallOf("pq_rerankP100",
      Similarity.pqRerankTopK(queries, emb, id, v, id, v, k = 10,
        pool = 100), 0.35)
    val pqRrBig = recallOf("pq_rrK64P200",
      Similarity.pqRerankTopK(queries, emb, id, v, id, v, k = 10,
        ks = 64, pool = 200), 0.75)
    val ivfPqRr = recallOf("ivfpq_rerank",
      Similarity.ivfPqRerankTopK(queries, emb, id, v, id, v, k = 10,
        refineIters = 2), 0.20)
    val ivfPqRrBig = recallOf("ivfpq_rrK64P200",
      Similarity.ivfPqRerankTopK(queries, emb, id, v, id, v, k = 10,
        ks = 64, pool = 200, refineIters = 2), 0.40)
    // multi-assignment (replicas=2) unblocks the single-assignment
    // containment cap on the rerank path (.545 measured): boundary
    // vectors become visible from both adjacent lists at the same
    // probe cost — the round-9 verdict's composition ask
    val ivfPqRrMa = recallOf("ivfpq_rrMA",
      Similarity.ivfPqRerankTopK(queries, emb, id, v, id, v, k = 10,
        ks = 64, pool = 200, refineIters = 2, replicas = 2), 0.70)
    // 1-bit sign quantization: the Hamming ordering is a coarse cosine
    // surrogate (64 bits of signal), and its real job is nomination —
    // the reranked floor is the one that matters
    val ham = recallOf("hamming",
      Similarity.hammingTopK(queries, emb, id, v, id, v, k = 10), 0.15)
    val hamRr = recallOf("hamming_rr",
      Similarity.hammingRerankTopK(queries, emb, id, v, id, v, k = 10,
        pool = 100), 0.55)
    // re-rank must dominate its ADC-ranked parent by a wide margin...
    assert(pqRr >= pq + 0.10,
      s"re-rank must lift PQ recall materially: $pqRr vs adc-ranked $pq")
    assert(ivfPqRr >= ivfPqLl + 0.10,
      s"re-rank must lift IVF-PQ recall materially: $ivfPqRr vs $ivfPqLl")
    // ...the pool/codebook knobs are monotone (bigger pool = superset;
    // ks=64 already proven >= ks=16 above)...
    assert(pqRr100 >= pqRr,
      s"pool=100 cannot lose recall vs pool=40: $pqRr100 < $pqRr")
    assert(pqRrBig >= pqRr100,
      s"ks=64/pool=200 cannot lose recall vs ks=16/pool=100: " +
        s"$pqRrBig < $pqRr100")
    // ...and reranked IVF-PQ stays bounded by whole-corpus PQ rerank at
    // the same (ks, pool): list pruning can only shed nominations.
    assert(ivfPqRrBig <= pqRrBig + 0.02,
      s"list pruning can only shed nominations vs whole-corpus PQ: " +
        s"$ivfPqRrBig vs $pqRrBig")
    // the Hamming rerank must lift its own nomination ranking
    // materially (pool containment >> bit-ordering fidelity)
    assert(hamRr >= ham + 0.10,
      s"re-rank must lift Hamming recall materially: $hamRr vs $ham")
    // multi-assignment widens probed-list containment, so it must lift
    // the rerank path materially over single-assignment...
    assert(ivfPqRrMa >= ivfPqRrBig + 0.10,
      s"replicas=2 must lift reranked IVF-PQ materially: " +
        s"$ivfPqRrMa vs single-assignment $ivfPqRrBig")
    // ...while remaining bounded by the whole-corpus PQ rerank at the
    // same (ks, pool): replication cannot nominate what ADC never ranks
    assert(ivfPqRrMa <= pqRrBig + 0.02,
      s"multi-assignment stays bounded by whole-corpus PQ rerank: " +
        s"$ivfPqRrMa vs $pqRrBig")
    // the codebook-size knob must actually buy recall (0.10 → 0.18
    // measured): the quality path OPQ builds on
    assert(pq64 >= pq, s"ks=64 cannot lose recall vs ks=16: $pq64 < $pq")

    // Lloyd refinement + multi-assignment is the round-8 verdict's
    // recall fix: 2 k-means rounds move centroids to density centers,
    // and storing each vector in its 2 nearest lists (SPANN-style
    // closure clustering) covers the boundary neighbors no centroid
    // placement can capture on this near-isotropic corpus (Lloyd alone
    // plateaus at .61 here). The lift at fixed nProbe=4 must be real:
    assert(ivfLl >= ivf + 0.10,
      s"Lloyd refinement must lift IVF recall materially: " +
        s"$ivfLl vs unrefined $ivf")
    // SQ8 quantizes scores, not list assignment — tracks its parent
    assert(math.abs(ivfSqLl - ivfLl) <= 0.1,
      s"IVF-SQ8-Lloyd should track IVF-Lloyd closely: $ivfSqLl vs $ivfLl")
    // PQ's ADC is the recall ceiling for ivf_pq regardless of how good
    // the list pruning is — refined lists cannot beat the quantizer
    assert(ivfPqLl <= pq + 0.1,
      s"IVF-PQ-Lloyd is still bounded by PQ's ADC: $ivfPqLl vs pq=$pq")

    // structure, not just floors
    assert(srpMp >= srp,
      s"multi-probe candidates are a superset of single-probe: " +
        s"$srpMp < $srp")
    assert(srpMp2 >= srpMp, s"more probes cannot lose recall: " +
      s"$srpMp2 < $srpMp")
    // SQ8 quantizes scores, not the list assignment: within a point or
    // two of plain IVF
    assert(math.abs(ivfSq - ivf) <= 0.1,
      s"IVF-SQ8 should track IVF closely: $ivfSq vs $ivf")
    // the probe knob must actually buy recall (the SCALE.md claim):
    // doubling nProbe doubles the scanned fraction and the candidate
    // set is a superset, so recall is monotone
    assert(ivf8 >= ivf, s"nProbe=8 cannot lose recall vs 4: $ivf8 < $ivf")
    // PQ on top of IVF pruning can only shed further recall
    assert(ivfPq <= pq + 0.1 && ivfPq <= ivf + 0.1,
      s"IVF-PQ cannot beat both its parents: $ivfPq vs pq=$pq ivf=$ivf")
    Caches.clear()
  }

  test("PCA-16 + SQ8 composition: near-lossless on a correlated " +
    "(random-walk) view where PCA-16 holds the variance, and honestly " +
    "near-floor on the isotropic corpus where NO 16-dim projection can " +
    "work — both measured, the SCALE.md project-then-quantize claim") {
    // correlated view: per-coordinate running sums (the OpqSpec
    // anisotropic case — variance concentrates in few directions)
    val ecol = transform(col("embedding"), x => x.cast("double"))
    val mixed = transform(sequence(lit(1), lit(64)),
      i => aggregate(slice(ecol, lit(1), i), lit(0.0), (a, x) => a + x))
    val mx = Caches.persist(emb.select(col("vec_id"), mixed.as("mx")))
    val mq = mx.filter(col("vec_id") % 100 === 0)
    val exactM = Similarity.bruteForceTopK(mq, mx, col("vec_id"),
      col("mx"), col("vec_id"), col("mx"), k = 10)
    val model = Similarity.pcaFit(mx, col("mx"), k = 16)
    val proj = mx.select(col("vec_id"),
      Similarity.pcaProject(col("mx"), model).as("pv"))
    val pq = proj.filter(col("vec_id") % 100 === 0)
    val approxM = Similarity.int8TopK(pq, proj, col("vec_id"), col("pv"),
      col("vec_id"), col("pv"), k = 10)
    val rM = Similarity.recallAtK(approxM, exactM)
    info(f"pca16+sq8 on correlated view: recall@10 = $rM%.3f")
    assert(rM >= 0.85,
      f"project-then-quantize lost the correlated case: $rM%.3f")
    // isotropic honest-negative: 16/64 dims of white noise cannot rank
    val model0 = Similarity.pcaFit(emb, col("embedding"), k = 16)
    val proj0 = emb.select(col("vec_id"),
      Similarity.pcaProject(col("embedding"), model0).as("pv"))
    val pq0 = proj0.filter(col("vec_id") % 100 === 0)
    val approx0 = Similarity.int8TopK(pq0, proj0, col("vec_id"),
      col("pv"), col("vec_id"), col("pv"), k = 10)
    val r0 = recallOf("pca16+sq8", approx0, floor = 0.05)
    info(f"isotropic corpus (no structure to keep): $r0%.3f")
    Caches.clear()
  }

  test("graph-traversal ANN recall floor (measured .825 at sf0.1) and " +
    "beam-width monotonicity in practice") {
    val (id, v) = (col("vec_id"), col("embedding"))
    // the once-per-corpus navigation graph: exact 8-NN at eval scale
    // (production nominates via the persisted IVF index instead)
    val edges = Caches.persist(
      Similarity.bruteForceTopK(emb, emb, id, v, id, v, k = 8)
        .select(col("q_id").as("src"), col("n_id").as("dst")))
    val g16 = recallOf("graph_b16",
      Similarity.graphTopK(queries, emb, edges, id, v, id, v,
        col("src"), col("dst"), k = 10), 0.75)
    // a narrower beam explores strictly less of the graph here
    // (measured .63 vs .825 — the gap is the beam, not noise)
    val g8 = recallOf("graph_b8",
      Similarity.graphTopK(queries, emb, edges, id, v, id, v,
        col("src"), col("dst"), k = 10, beam = 8), 0.50)
    assert(g16 >= g8,
      s"beam 16 must not lose recall vs beam 8: $g16 < $g8")
    Caches.clear()
  }
}
