package graft.analytics

import graft.SparkSuite
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSuite {
  import spark.implicits._

  test("pageRank on a directed cycle is the uniform fixed point: every " +
    "node keeps exactly the initial mass share") {
    // 4-cycle, outdeg 1 everywhere: inflow == previous rank, so
    // new = base + 85% * init == init at every round (integer-exactly,
    // since init = 25e10 divides cleanly by 100)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
      .toDF("src", "dst")
    val init = Graph.TotalMass / 4
    val ranks = Graph.pageRank(edges, col("src"), col("dst"), iters = 5)
      .as[(Long, Long)].collect().toMap
    assert(ranks.keySet == Set(0L, 1L, 2L, 3L))
    assert(ranks.values.forall(_ == init), s"expected all $init, got $ranks")
    Caches.clear()
  }

  test("pageRank concentrates mass on the hub of a star and conserves " +
    "total mass to within integer-floor leakage") {
    // 6 leaves all point at node 0; the hub points at leaf 1. Mass
    // sloshes hub <-> leaf 1 with a period-2 oscillation that decays at
    // 0.7225x per cycle, so the parity-stable claim at finite iters is
    // CONCENTRATION: hub and its sole citation both dominate every
    // uncited leaf (which sit at the teleport floor).
    val leaves = (1L to 6L).map(l => (l, 0L))
    val edges = (leaves :+ (0L, 1L)).toDF("src", "dst")
    val ranks = Graph.pageRank(edges, col("src"), col("dst"), iters = 10)
      .as[(Long, Long)].collect().toMap
    assert(ranks.size == 7)
    assert((2L to 6L).forall(l =>
      ranks(0L) > 4 * ranks(l) && ranks(1L) > 4 * ranks(l)),
      s"hub + citation must dominate uncited leaves: $ranks")
    // floor-division leaks < outdeg micro per node per round, plus the
    // damping floor: total stays within iters * nodes * ~2 micros
    val total = ranks.values.sum
    assert(math.abs(total - Graph.TotalMass) < 10L * 7L * 4L,
      s"mass off by ${Graph.TotalMass - total}")
    Caches.clear()
  }

  test("pageRank is replay-deterministic (same ranks from two builds)") {
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 0L),
      (3L, 2L)).toDF("src", "dst")
    def run() = Graph.pageRank(edges, col("src"), col("dst"), iters = 8)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(run() == run())
    Caches.clear()
  }

  test("pageRank routes mass around a dangling sink: uncited nodes decay " +
    "toward the teleport floor") {
    // 0 -> 1 -> 2, 2 has no out-edges (dangling): node 0 is never cited,
    // so its rank must fall to the teleport floor base = 15% of init
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val ranks = Graph.pageRank(edges, col("src"), col("dst"), iters = 20)
      .as[(Long, Long)].collect().toMap
    val init = Graph.TotalMass / 3
    val base = 15L * init / 100L
    assert(ranks(0L) == base, s"uncited node must sit at base=$base: $ranks")
    assert(ranks(2L) > ranks(1L) && ranks(1L) > ranks(0L),
      s"rank must grow down the chain: $ranks")
    Caches.clear()
  }

  test("pageRank returns a checkpoint-flattened frame: plan depth is " +
    "constant in iters (the dedupClusters plan-tree discipline)") {
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 0L))
      .toDF("src", "dst")
    def planOf(iters: Int): String =
      Graph.pageRank(edges, col("src"), col("dst"), iters)
        .queryExecution.optimizedPlan.toString
    val p2 = planOf(2)
    val p8 = planOf(8)
    // the returned frame reads the LAST round's checkpoint — no joins,
    // no growth with iteration count
    assert(!p8.contains("Join"), p8)
    assert(p8.linesIterator.size == p2.linesIterator.size,
      s"plan depth grew with iters:\n$p2\nvs\n$p8")
    Caches.clear()
  }

  test("personalizedPageRank confines mass to the seed's component and " +
    "flags seeds") {
    // two disconnected 2-cycles; seed = node 0 only. The {2,3} component
    // receives no teleport and no inflow -> exactly zero rank forever.
    val edges = Seq((0L, 1L), (1L, 0L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val seeds = Seq(0L).toDF("id")
    val r = Graph.personalizedPageRank(edges, col("src"), col("dst"),
      seeds, col("id"), iters = 10)
      .as[(Long, Long, Boolean)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(r(2L)._1 == 0L && r(3L)._1 == 0L,
      s"unreachable component must hold zero mass: $r")
    assert(r(0L)._1 > 0L && r(1L)._1 > 0L, s"seed component starved: $r")
    assert(r(0L)._2 && !r(1L)._2 && !r(2L)._2, s"is_seed flags wrong: $r")
    // seed keeps the teleport premium over its non-seed partner
    assert(r(0L)._1 > r(1L)._1, s"seed must out-rank its satellite: $r")
    Caches.clear()
  }

  test("labelPropagation spreads a seed label down the pointer chain one " +
    "hop per round, and unreached nodes stay null") {
    // 3 -> 2 -> 1 -> 0(seed, label 7): the wavefront needs one round per
    // hop, so iters=2 labels {1,2} but leaves 3 null; iters=3 labels all
    val edges = Seq((1L, 0L), (2L, 1L), (3L, 2L)).toDF("src", "dst")
    val seeds = Seq((0L, 7)).toDF("id", "lab")
    def run(iters: Int) =
      Graph.labelPropagation(edges, col("src"), col("dst"),
        seeds, col("id"), col("lab"), iters)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val r2 = run(2)
    assert(r2 == Map(0L -> Some(7L), 1L -> Some(7L), 2L -> Some(7L),
      3L -> None), s"got $r2")
    val r3 = run(3)
    assert(r3(3L) == Some(7L), s"round 3 must reach node 3: $r3")
    Caches.clear()
  }

  test("labelPropagation takes the majority vote, breaks count ties on " +
    "the smallest label, and never rewrites a seed") {
    // node 10 points at seeds {1,2,3}: two say label 5, one says 4 ->
    // majority 5. Node 11 points at {1,4}: one vote each (5 vs 2) ->
    // tie -> min label 2. Seed 1 points at seed 4 but keeps its own 5.
    val edges = Seq((10L, 1L), (10L, 2L), (10L, 3L), (11L, 1L),
      (11L, 4L), (1L, 4L)).toDF("src", "dst")
    val seeds = Seq((1L, 5), (2L, 5), (3L, 4), (4L, 2)).toDF("id", "lab")
    val r = Graph.labelPropagation(edges, col("src"), col("dst"),
      seeds, col("id"), col("lab"), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r(10L) == 5L, s"majority must win: $r")
    assert(r(11L) == 2L, s"vote tie must break on min label: $r")
    assert(r(1L) == 5L, s"seed must stay pinned: $r")
    Caches.clear()
  }

  test("labelPropagation recovers planted communities: two cliques with " +
    "one cross edge each adopt their own seed's label") {
    // cliques {0..4} and {5..9} (directed both ways), one cross edge
    // 4 <-> 5; seeds: 0 -> label 1, 5 -> label 2. Node 4 sees the rival
    // label through the cross edge but its clique majority must win.
    val cliqueA = for { a <- 0L to 4L; b <- 0L to 4L if a != b } yield (a, b)
    val cliqueB = for { a <- 5L to 9L; b <- 5L to 9L if a != b } yield (a, b)
    val edges = (cliqueA ++ cliqueB ++ Seq((4L, 5L), (5L, 4L)))
      .toDF("src", "dst")
    val seeds = Seq((0L, 1), (5L, 2)).toDF("id", "lab")
    val r = Graph.labelPropagation(edges, col("src"), col("dst"),
      seeds, col("id"), col("lab"), iters = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 4L).forall(r(_) == 1L), s"clique A must take label 1: $r")
    assert((5L to 9L).forall(r(_) == 2L), s"clique B must take label 2: $r")
    Caches.clear()
  }

  test("labelPropagation returns a checkpoint-flattened frame whose plan " +
    "depth does not grow with iters") {
    val edges = Seq((1L, 0L), (2L, 1L), (0L, 2L)).toDF("src", "dst")
    val seeds = Seq((0L, 1)).toDF("id", "lab")
    def planOf(iters: Int): String =
      Graph.labelPropagation(edges, col("src"), col("dst"),
        seeds, col("id"), col("lab"), iters)
        .queryExecution.optimizedPlan.toString
    val p3 = planOf(3)
    val p9 = planOf(9)
    assert(p9.linesIterator.size == p3.linesIterator.size,
      s"plan depth grew with iters:\n$p3\nvs\n$p9")
    Caches.clear()
  }

  test("kCore peels a pendant off a triangle but keeps the 2-core, " +
    "counting mutual directed edges once") {
    // triangle 0-1-2 (one direction each — symmetrization must make
    // them undirected) plus BOTH directions of pendant 3-0 (must
    // collapse to one undirected edge, so 3 has degree 1, not 2)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 0L), (0L, 3L))
      .toDF("src", "dst")
    val r = Graph.kCore(edges, col("src"), col("dst"), k = 2, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(0L -> 2L, 1L -> 2L, 2L -> 2L),
      s"triangle is the 2-core, pendant peels: $r")
    Caches.clear()
  }

  test("kCore cascades deletions: a path has no 2-core, and peeling " +
    "reaches the empty fixpoint within rounds") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = Graph.kCore(edges, col("src"), col("dst"), k = 2, rounds = 4)
    assert(r.count() == 0L, "a path graph has no 2-core")
    Caches.clear()
  }

  test("kCore synchronous peeling converges: rounds and rounds-1 agree " +
    "on the eval fixture shape") {
    // two triangles sharing node 0, plus a 2-chain tail: the 2-core is
    // both triangles; the tail peels in 2 sweeps
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 3L), (3L, 4L),
      (4L, 0L), (0L, 5L), (5L, 6L)).toDF("src", "dst")
    def run(rounds: Int) =
      Graph.kCore(edges, col("src"), col("dst"), k = 2, rounds = rounds)
        .as[(Long, Long)].collect().toMap
    val a = run(3)
    assert(a == run(4), "peeling must have reached its fixpoint")
    assert(a.keySet == Set(0L, 1L, 2L, 3L, 4L), s"got $a")
    assert(a(0L) == 4L && a(1L) == 2L, s"core degrees wrong: $a")
    Caches.clear()
  }

  test("knnHubness histogram counts in-degrees over the SOURCE node set " +
    "and accounts for every node once") {
    // 0,1,2 each emit edges; 9 only receives (not a source -> not a node
    // row); 2 receives nothing -> in_deg 0 bucket
    val edges = Seq((0L, 1L), (0L, 9L), (1L, 0L), (1L, 9L), (2L, 0L))
      .toDF("src", "dst")
    val h = Graph.knnHubness(edges, col("src"), col("dst"))
      .as[(Long, Long)].collect().toMap
    // in-degrees among sources: 0 <- {1,2} = 2; 1 <- {0} = 1; 2 <- {} = 0
    assert(h == Map(0L -> 1L, 1L -> 1L, 2L -> 1L), s"got $h")
    Caches.clear()
  }

  test("triangles on K4-plus-pendant: every clique node closes all 3 of " +
    "its wedges, the pendant closes none") {
    // K4 on {0,1,2,3} given as one direction only (symmetrization is the
    // operator's job), plus pendant 4-0
    val k4 = for { i <- 0L to 3L; j <- (i + 1) to 3L } yield (i, j)
    val edges = (k4 :+ (4L, 0L)).toDF("src", "dst")
    val t = Graph.triangles(edges, col("src"), col("dst"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // clique nodes: deg 3 (node 0: 4 incl. pendant), tri 3, cc = 1.0
    // except node 0 whose deg-4 neighborhood has 3 of C(4,2)=6 pairs
    // adjacent -> cc = 0.5; pendant: deg 1, tri 0, cc 0
    assert(t == Seq(
      (0L, 3L, 4L, 500000L),
      (1L, 3L, 3L, 1000000L),
      (2L, 3L, 3L, 1000000L),
      (3L, 3L, 3L, 1000000L),
      (4L, 0L, 1L, 0L)), s"got $t")
    Caches.clear()
  }

  test("triangles on a triangle-free graph (4-cycle) is all zeros and " +
    "each triangle is counted once, not once per orientation") {
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
      .toDF("src", "dst")
    val t = Graph.triangles(cyc, col("src"), col("dst"))
      .as[(Long, Long, Long, Long)].collect()
    assert(t.forall(r => r._2 == 0L && r._4 == 0L), s"got ${t.toSeq}")
    // one triangle given redundantly in BOTH directions still counts 1
    val bidir = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L), (2L, 0L),
      (0L, 2L)).toDF("src", "dst")
    val t2 = Graph.triangles(bidir, col("src"), col("dst"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(t2 == Seq((0L, 1L, 2L, 1000000L), (1L, 1L, 2L, 1000000L),
      (2L, 1L, 2L, 1000000L)), s"got $t2")
    Caches.clear()
  }

  test("triangles is replay-deterministic and credits a shared-edge " +
    "bowtie correctly: the cut vertex sees both triangles") {
    // bowtie: triangles {0,1,2} and {0,3,4} share vertex 0
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 3L), (3L, 4L),
      (4L, 0L)).toDF("src", "dst")
    def run() = Graph.triangles(edges, col("src"), col("dst"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val t = run()
    assert(t == run())
    // node 0: deg 4, 2 triangles, cc = 2*2/(4*3) = 1/3 -> 333333 micro
    assert(t.head == (0L, 2L, 4L, 333333L), s"got ${t.head}")
    assert(t.tail.forall(r => r._2 == 1L && r._3 == 2L &&
      r._4 == 1000000L), s"got $t")
    Caches.clear()
  }
}
