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
}
