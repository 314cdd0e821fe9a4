package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics over document/embedding relation graphs — the curation
  * signals that need link STRUCTURE, not per-row features: PageRank
  * centrality over the k-NN graph (authoritative-sample selection) and
  * hubness diagnostics (Radovanović et al., JMLR 2010 — skewed k-occurrence
  * is the standard symptom of a degraded embedding space).
  *
  * The graph here is derived (k-NN edges from the embedding table via the
  * existing `Similarity` stack) because the corpus tables carry no explicit
  * link column; the operators themselves take an arbitrary `(src, dst)`
  * edge frame, so a real crawl's hyperlink table drops straight in.
  *
  * Determinism: ranks live in integer MICRO-MASS units (a fixed total mass
  * of 1e12 longs split across nodes) and every update is long division +
  * long sums — order-independent, so Spark partial aggregation and the
  * DuckDB oracle's serial replay produce bit-identical ranks. The same
  * integer-arithmetic scheme the logistic trainer uses (TextAnalysis
  * `logisticFit`), applied to power iteration.
  */
object Graph {

  /** Total rank mass in micro-units. 1e12 over ≥2 nodes keeps every
    * per-node rank comfortably inside a long through `85 * rank` (max
    * 8.5e13) while giving ~12 significant digits — float-free PageRank. */
  val TotalMass: Long = 1000000000000L

  /** PageRank by power iteration over an `(src, dst)` edge frame.
    *
    * Per round, each node sends `rank div outdeg` down every out-edge
    * (long floor-division; the ≤outdeg remainder micros stay with the
    * node implicitly — deterministic leakage ≪ 1e-9 of mass per round),
    * then `new = (15 * init) div 100 + (85 * inflow) div 100` — damping
    * 0.85 with uniform teleport, all in integer micros.
    *
    * Scale shape: `edges` is persisted once (reused every round); each
    * round is ONE shuffle join (ranks × edges on src — both sides hash
    * on src) plus ONE aggregate (sum by dst, partial map-side). The
    * iterative lineage grows linearly with rounds (each round's plan
    * stacks a join + agg on the previous round's), so the rank frame is
    * `localCheckpoint`ed every `ckptEvery` rounds AND on the final round
    * — plan depth stays bounded by the cadence (and the RETURNED frame
    * always reads the last checkpoint: no joins in its plan), while the
    * eager materialization cost drops from `iters` to `iters/ckptEvery`
    * flushes. The loop-invariant frames (`nodes`, `e`) are
    * persist(localCheckpoint(false).repartition(p, key)) — all three
    * layers load-bearing (round 16): the checkpoint FLATTENS the cached
    * subtree (a bare persist keeps the full upstream logical plan,
    * which every round re-analyzes and the cache manager re-matches —
    * measured 0.81× on graph_pagerank), the explicit-N repartition pins
    * the hash layout, and the persist is what PRESERVES it — a
    * checkpoint alone reports UnknownPartitioning under AQE (the lazy
    * AdaptiveSparkPlan has no final partitioning when the LogicalRDD is
    * captured; measured on Spark 4.1 for lazy AND eager), which would
    * silently re-exchange the edge frame every round at any scale.
    * Same production caveat as the clustering loop: swap reliable
    * `checkpoint()` in where executor loss matters. At 100 TB the edge
    * frame is pre-bucketed by src and the per-round cost is the inflow
    * aggregate; iterations are a constant (10–20), not a
    * data-dependent loop.
    *
    * Dangling nodes (no out-edges) keep receiving teleport mass but
    * forward nothing — and, unlike canonical PageRank, the un-forwarded
    * mass is NOT redistributed (no dangling-mass term), so on graphs with
    * sinks the total mass decays each round. Rankings remain a useful
    * order but the VALUES are the "mass-leaking" variant, not comparable
    * to standard PageRank on sink-bearing edge frames. A k-NN graph has
    * no sinks (every node emits exactly k edges), which is the designed
    * use; pass a sink-free frame (or pre-add self-loops on sinks) if
    * standard-PageRank values matter.
    *
    * Output: `(node, rank)` with rank in micro-mass longs, one row per
    * distinct node appearing in `edges`. */
  def pageRank(edges: DataFrame, src: Column, dst: Column,
               iters: Int = 10, ckptEvery: Int = 5): DataFrame = {
    // persisted: referenced four times below (node union ×2, the outdeg
    // aggregate, the join's edge side) — an expensive upstream edge
    // derivation (the O(n²) exact k-NN build) would otherwise recompute
    // per reference
    val e0 = Caches.persist(edges.select(src.as("src"), dst.as("dst")))
    // size-adaptive loop partition count: every cached frame and every
    // loop-state exchange below is pinned to it, keeping all per-round
    // joins CO-PARTITIONED (round 16: with the count left at
    // spark.sql.shuffle.partitions the planner instead re-broadcast the
    // cached edge frame every round — a per-round BroadcastExchange
    // rebuild measured at ~0.45 s/round at sf0.1, and at 100 TB the
    // broadcast side would be the EDGE table). Derived from the
    // MATERIALIZED count of the persisted frame (r16 advice, the kCore
    // pattern), not the optimizer estimate — the _ivf variants feed
    // derived kNN-graph plans whose estimates can inflate p toward the
    // clamp or pin a production frame at the floor; the count is one
    // cheap action over data round 1 materializes anyway.
    val p = Tuning.loopPartitionsForRows(edges.sparkSession, e0.count(), 16)
    val nodes = Caches.persist(e0.select(col("src").as("node"))
        .union(e0.select(col("dst").as("node"))).distinct()
        .localCheckpoint(false)
        .repartition(p, col("node")))
    val n = nodes.count()
    require(n >= 2, s"pageRank needs >= 2 nodes, got $n")
    val init = TotalMass / n
    val base = (15L * init) / 100L
    // out-degree rides each edge row so the contribution is a pure
    // projection after the per-round join. The persisted frame is
    // explicitly hash-partitioned on src — the per-round join key — so
    // every round's join reuses the cached exchange: the |edges| side
    // is never re-shuffled inside the loop, only the (small) rank frame
    // moves. At 100 TB this is the bucketed edge table.
    val e = Caches.persist(
      e0.join(e0.groupBy(col("src")).agg(count(lit(1)).as("outdeg")),
        Seq("src")).localCheckpoint(false)
        .repartition(p, col("src")))
    var ranks = nodes.withColumn("rank", lit(init))
      .localCheckpoint(false)
    (1 to iters).foreach { i =>
      // `div` (integral division), NOT double `/` + cast: a double
      // quotient within one ulp of an integer boundary rounds UP and
      // breaks the exact integer contract the oracle replays.
      // SHUFFLE_HASH on the rank side: the cached edge partition stays
      // streamed and UNSORTED (SMJ would re-sort it every round; a
      // broadcast would rebuild and ship it every round); the explicit
      // repartition(p, node) feeds the inflow aggregate AND the
      // co-partitioned left join, so each round is exactly ONE exchange
      // of the small rank-mass rows.
      val inflow = e.join(ranks.hint("SHUFFLE_HASH"),
          e("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr("rank div outdeg").as("c"))
        .repartition(p, col("node"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      ranks = nodes.join(inflow.hint("SHUFFLE_HASH"), Seq("node"), "left")
        .select(col("node"),
          expr(s"${base}L + (85L * coalesce(inflow, 0L)) div 100L")
            .as("rank"))
      if (i % ckptEvery == 0 || i == iters)
        ranks = ranks.localCheckpoint(false)
    }
    ranks
  }

  /** Personalized PageRank (topic-sensitive, Haveliwala WWW 2002): the
    * teleport mass lands ONLY on `seeds` — stationary mass then measures
    * proximity to the seed set through the link structure, the
    * seed-expansion primitive ("given a trusted sub-corpus, rank
    * everything else by relatedness") a curation pipeline uses to grow a
    * quality domain from a vetted nucleus.
    *
    * Same integer micro-mass contract and per-round plan as `pageRank`;
    * the only deltas are the init (all mass split across seeds, zero
    * elsewhere) and the damping base (15% of the seed share for seeds,
    * zero for everyone else). Seeds not present in the edge frame are
    * ignored; requires ≥1 surviving seed. Output: `(node, rank,
    * is_seed)`. */
  def personalizedPageRank(edges: DataFrame, src: Column, dst: Column,
                           seeds: DataFrame, seedCol: Column,
                           iters: Int = 10, ckptEvery: Int = 5): DataFrame = {
    // persisted for the same four-reference reason as pageRank's e0
    val e0 = Caches.persist(edges.select(src.as("src"), dst.as("dst")))
    // same size-adaptive pinned-partitioning discipline as pageRank,
    // derived from the materialized persisted-edge count (r16 advice)
    val p = Tuning.loopPartitionsForRows(edges.sparkSession, e0.count(), 16)
    val sd = seeds.select(seedCol.as("node")).distinct()
    val nodes = Caches.persist(e0.select(col("src").as("node"))
        .union(e0.select(col("dst").as("node"))).distinct()
        .join(sd.withColumn("is_seed", lit(true)), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("is_seed"), lit(false)).as("is_seed"))
        .localCheckpoint(false)
        .repartition(p, col("node")))
    val nSeeds = nodes.filter(col("is_seed")).count()
    require(nSeeds >= 1, "personalizedPageRank needs >= 1 seed in the graph")
    val share = TotalMass / nSeeds
    val base = (15L * share) / 100L
    // same cached-exchange discipline as pageRank: partition on the
    // per-round join key once, reuse it every round
    val e = Caches.persist(
      e0.join(e0.groupBy(col("src")).agg(count(lit(1)).as("outdeg")),
        Seq("src")).localCheckpoint(false)
        .repartition(p, col("src")))
    var ranks = nodes
      .select(col("node"),
        when(col("is_seed"), lit(share)).otherwise(lit(0L)).as("rank"))
      .localCheckpoint(false)
    (1 to iters).foreach { i =>
      // one exchange per round — see pageRank's loop comment
      val inflow = e.join(ranks.hint("SHUFFLE_HASH"),
          e("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr("rank div outdeg").as("c"))
        .repartition(p, col("node"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      ranks = nodes.join(inflow.hint("SHUFFLE_HASH"), Seq("node"), "left")
        .select(col("node"),
          (when(col("is_seed"), lit(base)).otherwise(lit(0L)) +
            expr("(85L * coalesce(inflow, 0L)) div 100L")).as("rank"))
      if (i % ckptEvery == 0 || i == iters)
        ranks = ranks.localCheckpoint(false)
    }
    ranks.join(nodes, Seq("node"))
      .select(col("node"), col("rank"), col("is_seed"))
  }

  /** Semi-supervised label propagation (Zhu & Ghahramani CMU-CALD-02-107;
    * the LPA community variant of Raghavan et al. PRE 2007): a small
    * vetted seed set carries trusted labels, and every other node
    * repeatedly adopts the MAJORITY label among the nodes it points at —
    * the "grow a topic/quality domain from a vetted nucleus" move, like
    * `personalizedPageRank` but producing a hard class per node instead
    * of one score per seed set (one propagation labels ALL classes at
    * once).
    *
    * Determinism (the oracle-replay contract): updates are synchronous
    * (round r reads only round r-1's labels), the vote argmax breaks
    * count ties on the SMALLEST label, seeds are pinned forever, and a
    * node with no labeled out-neighbor keeps its previous label (null
    * until the wavefront reaches it) — every rule integer/label
    * arithmetic, no floats anywhere.
    *
    * Scale shape: per round ONE shuffle join (labels × edges on dst)
    * feeding a two-level aggregate — (node, label) counts, then the
    * per-node argmax as `min(struct(-count, label))`, both
    * partial-aggregatable (the map-side combine sees at most |labels|
    * rows per node; no sort window). Lineage is checkpoint-bounded on
    * the `pageRank` cadence. Linear in iters × |edges|.
    *
    * Output: `(node, label, is_seed)`, label null only where no labeled
    * node is reachable within `iters` hops. */
  def labelPropagation(edges: DataFrame, src: Column, dst: Column,
                       seeds: DataFrame, idCol: Column, labCol: Column,
                       iters: Int = 5, ckptEvery: Int = 3): DataFrame = {
    // checkpoint the raw edge projection once (for the _ivf variant this
    // is the derived kNN build), size the pinned loop partitioning from
    // its MATERIALIZED count (r16 advice — see pageRank), then persist
    // at the per-round join key's layout
    val e1 = edges.select(src.as("src"), dst.as("dst"))
      .localCheckpoint(false)
    val p = Tuning.loopPartitionsForRows(edges.sparkSession, e1.count(), 16)
    // votes join on dst every round — partition the cached frame on it
    val e = Caches.persist(e1.repartition(p, col("dst")))
    val sd = seeds.select(idCol.as("node"), labCol.cast("long").as("seed_lab"))
      .groupBy(col("node")).agg(min(col("seed_lab")).as("seed_lab"))
    val nodes = Caches.persist(e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
        .join(sd, Seq("node"), "left")
        .select(col("node"), col("seed_lab"),
          col("seed_lab").isNotNull.as("is_seed"))
        .localCheckpoint(false)
        .repartition(p, col("node")))
    // loop state CARRIES the frozen seed columns (round 17, §2.4): the
    // previous form re-joined `nodes` into the state every round just to
    // re-attach is_seed/seed_lab — a per-round hash build + probe over
    // ALL nodes (and one more at the readout) for two small columns that
    // never change. Values and update order are identical.
    var labs = nodes.select(col("node"), col("seed_lab"), col("is_seed"),
        col("seed_lab").as("lab"))
      .localCheckpoint(false)
    (1 to iters).foreach { i =>
      // one exchange per round (repartition(p, vn) — hash(vn) satisfies
      // the (vn, lab) clustering of the first aggregate AND the (vn)
      // clustering of the argmin, so both fold exchange-free); the vote
      // join streams the cached dst-partitioned edge frame unsorted
      // (SHUFFLE_HASH — SMJ would re-sort it every round, broadcast
      // would rebuild + ship it every round). Project the state to
      // (node, lab) before the edge join — the frozen seed columns must
      // not ride the vote fan-out (§2.3).
      val lv = labs.select(col("node"), col("lab"))
      val votes = e.join(lv.hint("SHUFFLE_HASH"), e("dst") === lv("node"))
        .filter(col("lab").isNotNull)
        .select(col("src").as("vn"), col("lab"))
        .repartition(p, col("vn"))
        .groupBy(col("vn"), col("lab")).agg(count(lit(1)).as("c"))
        .groupBy(col("vn"))
        .agg(min(struct((-col("c")).as("nc"), col("lab").as("l"))).as("w"))
        .select(col("vn").as("node"), col("w.l").as("vlab"))
      labs = labs
        .select(col("node"), col("seed_lab"), col("is_seed"),
          col("lab").as("plab"))
        .join(votes.hint("SHUFFLE_HASH"), Seq("node"), "left")
        .select(col("node"), col("seed_lab"), col("is_seed"),
          when(col("is_seed"), col("seed_lab"))
            .otherwise(coalesce(col("vlab"), col("plab"))).as("lab"))
      if (i % ckptEvery == 0 || i == iters)
        labs = labs.localCheckpoint(false)
    }
    labs.select(col("node"), col("lab").as("label"), col("is_seed"))
  }

  /** k-core decomposition by synchronous peeling (Seidman, Social
    * Networks 1983): symmetrize the edge frame, then repeatedly delete
    * every node whose UNDIRECTED degree is below `k` — what survives is
    * the maximal subgraph where everyone keeps ≥ k neighbors, the
    * standard "densely embedded region" filter (for a k-NN graph: drop
    * periphery/outlier vectors whose neighborhoods don't reciprocate).
    *
    * Determinism: peeling runs a FIXED `rounds` sweeps in both engines
    * (synchronous deletion — round r's degrees count only round r-1
    * survivors), so the output is bit-identical even if a pathological
    * graph hasn't reached its fixpoint; peeling converges when a sweep
    * deletes nobody, and callers can assert convergence by comparing
    * `rounds` vs `rounds-1` outputs (the eval spec does).
    *
    * Scale shape: the symmetrized edge frame is persisted once; each
    * sweep is one partial-aggregatable degree count over surviving
    * edges plus two semi-joins re-filtering the edge frame — no windows,
    * no all-pairs anything; linear in rounds × |edges|. Survivor lineage
    * is checkpoint-bounded on the `pageRank` cadence.
    *
    * Output: `(node, core_deg)` for surviving nodes — degree within the
    * final core. Empty when no k-core exists. */
  def kCore(edges: DataFrame, src: Column, dst: Column, k: Int,
            rounds: Int = 8, ckptEvery: Int = 3): DataFrame = {
    require(k >= 1 && rounds >= 1)
    // size-adaptive loop partitioning, derived from the materialized
    // symmetrized-edge count (the edge input here is usually a derived
    // plan — intersects/unions — whose optimizer estimate is unusable;
    // the count is an action on the cache round 1 materializes anyway)
    val e0 = edges.select(src.as("src"), dst.as("dst"))
    val und0 = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .filter(col("src") =!= col("dst")).distinct()
        .localCheckpoint(false)
    val p = Tuning.loopPartitionsForRows(e0.sparkSession, und0.count(), 16)
    // undirected simple graph: mutual k-NN edges collapse to one
    // per-sweep degree count groups by src — partition the cached
    // symmetrized frame on it so sweeps reuse one exchange
    val und = Caches.persist(und0.repartition(p, col("src")))
    var alive = und.select(col("src").as("node")).distinct()
      .localCheckpoint(false)
    (1 to rounds).foreach { i =>
      val deg = und
        .join(alive.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(alive.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
      alive = deg.filter(col("d") >= k).select(col("node"))
      if (i % ckptEvery == 0 || i == rounds)
        alive = alive.localCheckpoint(false)
    }
    und
      .join(alive.select(col("node").as("src")), Seq("src"), "left_semi")
      .join(alive.select(col("node").as("dst")), Seq("dst"), "left_semi")
      .groupBy(col("src").as("node")).agg(count(lit(1)).as("core_deg"))
  }

  /** Per-node triangle count and local clustering coefficient over an
    * arbitrary edge frame (symmetrized + deduped internally), by the
    * degree-ordered compact-forward scheme (Schank & Wagner, WEA 2005;
    * the same orientation trick Latapy, TCS 2008 analyzes): orient every
    * undirected edge from its (degree, id)-smaller endpoint to the
    * larger, enumerate wedges only at the orientation source, and close
    * each wedge with ONE semi-join probe. Every triangle {u ≺ v ≺ w} is
    * generated exactly once — as the wedge (u→v, u→w) closed by (v→w).
    *
    * Scale shape: the wedge fan-out at a node is its ORIENTED
    * out-degree squared, and degree-ordering bounds the oriented
    * out-degree by O(√m) on any graph (arboricity bound) — a raw
    * node-iterator would square the max RAW degree, which on a
    * power-law crawl graph is the whole corpus. Three hash joins total
    * (two degree attachments + the wedge self-join) plus one semi-join;
    * everything partial-aggregatable; no windows, no global sort — the
    * (deg, id) order is evaluated as a tuple PREDICATE per edge, never
    * materialized as a row_number over the node set.
    *
    * Clustering coefficient is exact-integer: `cc_micro =
    * (2·tri·1e6) div (deg·(deg−1))` — hash-stable against the oracle's
    * serial replay. Output: `(node, tri_cnt, deg, cc_micro)`, one row
    * per node of the symmetrized graph. */
  def triangles(edges: DataFrame, src: Column, dst: Column): DataFrame = {
    // size-adaptive pinned partitioning (see pageRank): the symmetrized
    // frame, degrees and the oriented frame all live at hash(src, p),
    // so the degree aggregate, the src-side degree attachment and the
    // wedge self-join (both arms read o at its cached layout) are
    // exchange-free; only the dst-side attachment pays a regroup.
    // p comes from the MATERIALIZED symmetrized-edge count (r16 advice,
    // the kCore pattern) — the _ivf variant's derived-plan estimate is
    // unusable.
    val e0 = edges.select(src.as("src"), dst.as("dst"))
    val und0 = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(false)
    val p = Tuning.loopPartitionsForRows(edges.sparkSession, und0.count(), 16)
    // persisted: the symmetrized frame feeds the degree aggregate and
    // the orientation join; degrees feed two attachments + the readout
    val und = Caches.persist(und0.repartition(p, col("src")))
    val deg = und.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    // keep each undirected edge once, oriented small-(deg,id) → large;
    // carry the head's degree so wedge ordering needs no extra join
    // persisted (r16 advice): o is referenced three times (both wedge
    // arms + the closure semi-probe); a bare repartition after the
    // checkpoint is NOT preserved under AQE without persist (the same
    // pitfall the pageRank pinning documents), so without it the
    // exchange-free wedge self-join depended on ReuseExchange
    // deduplicating three identical exchanges.
    val o = Caches.persist(
      und.join(deg.select(col("node").as("src"), col("deg").as("sdeg"))
          .hint("SHUFFLE_HASH"), Seq("src"))
        .repartition(p, col("dst"))
        .join(deg.select(col("node").as("dst"), col("deg").as("ddeg"))
          .hint("SHUFFLE_HASH"), Seq("dst"))
        .filter(col("sdeg") < col("ddeg") ||
          (col("sdeg") === col("ddeg") && col("src") < col("dst")))
        .select(col("src"), col("dst"), col("ddeg"))
        .localCheckpoint(false)
        .repartition(p, col("src")))
    val a = o.select(col("src").as("u"), col("dst").as("v"),
      col("ddeg").as("vdeg"))
    val b = o.select(col("src").as("u"), col("dst").as("w"),
      col("ddeg").as("wdeg"))
    val wedges = a.join(b, Seq("u"))
      .filter(col("vdeg") < col("wdeg") ||
        (col("vdeg") === col("wdeg") && col("v") < col("w")))
    val tri = wedges.join(
      o.select(col("src").as("v"), col("dst").as("w")),
      Seq("v", "w"), "left_semi")
    val perNode = tri.select(col("u").as("node"))
      .union(tri.select(col("v").as("node")))
      .union(tri.select(col("w").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("tri"), lit(0L)).as("tri_cnt"),
        col("deg"),
        when(col("deg") >= 2L,
          expr("(2 * coalesce(tri, 0) * 1000000) div (deg * (deg - 1))"))
          .otherwise(lit(0L)).as("cc_micro"))
  }

  /** k-occurrence (in-degree) histogram of a k-NN graph — the hubness
    * diagnostic: how many nodes appear in exactly `in_deg` other nodes'
    * neighbor lists. A healthy space concentrates near `k`; a heavy right
    * tail (hubs) plus a spike at 0 (anti-hubs) flags an embedding space
    * where distance concentration is hurting retrieval. One aggregate
    * over the edge frame, then one over the node frame — fully
    * partial-aggregatable, linear in |edges|. Nodes cited by nobody
    * surface via the left join from the node set (in_deg 0). */
  def knnHubness(edges: DataFrame, src: Column, dst: Column): DataFrame = {
    // persisted: referenced twice (node set + in-degree aggregate)
    val e0 = Caches.persist(edges.select(src.as("src"), dst.as("dst")))
    val nodes = e0.select(col("src").as("node")).distinct()
    val indeg = e0.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_deg"))
    nodes.join(indeg, Seq("node"), "left")
      .select(coalesce(col("in_deg"), lit(0L)).as("in_deg"))
      .groupBy(col("in_deg")).agg(count(lit(1)).as("n_nodes"))
  }
}
