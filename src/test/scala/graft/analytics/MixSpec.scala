package graft.analytics

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MixSpec extends SparkSuite {
  import spark.implicits._

  private def solve(rows: Seq[(String, Double, Double)], b: Double) =
    Mix.waterfillAlloc(rows.toDF("s", "c", "w"),
      col("s"), col("c"), col("w"), b)
      .select("source", "cap", "wt", "alloc", "sat")
      .as[(String, Double, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap

  test("waterfill: budget exhausts exactly, caps bind, excess reflows " +
    "proportional to weight") {
    // caps 100/1000/1000, weights 5/1/4, B=1000:
    // r = 20/1000/250 → 'a' saturates (cap 100), remaining 900 splits
    // 1:4 over b/c → 180/720, both under cap
    val r = solve(Seq(("a", 100.0, 5.0), ("b", 1000.0, 1.0),
      ("c", 1000.0, 4.0)), 1000.0)
    assert(r("a")._4 == 100.0 && r("a")._5, r("a"))
    assert(r("b")._4 == 180.0 && !r("b")._5, r("b"))
    assert(r("c")._4 == 720.0 && !r("c")._5, r("c"))
  }

  test("waterfill: cascading saturation — a second source binds once " +
    "the first's excess reflows") {
    // caps 50/300/5000, weights 1/2/2, B=2000: r = 50/150/2500.
    // a saturates (50); then λ=(2000-50)/4=487.5 → b's 975 > cap 300 →
    // b saturates too; final λ=(2000-350)/2=825 → c gets 1650
    val r = solve(Seq(("a", 50.0, 1.0), ("b", 300.0, 2.0),
      ("c", 5000.0, 2.0)), 2000.0)
    assert(r("a")._4 == 50.0 && r("a")._5, r("a"))
    assert(r("b")._4 == 300.0 && r("b")._5, r("b"))
    assert(r("c")._4 == 1650.0 && !r("c")._5, r("c"))
    assert(r.values.map(_._4).sum == 2000.0)
  }

  test("waterfill: budget above total capacity saturates everyone at cap") {
    val r = solve(Seq(("a", 10.0, 1.0), ("b", 20.0, 9.0)), 1e9)
    assert(r("a")._4 == 10.0 && r("a")._5)
    assert(r("b")._4 == 20.0 && r("b")._5)
  }

  test("waterfill: nobody saturates when the budget is small — pure " +
    "proportional split") {
    val r = solve(Seq(("a", 1000.0, 1.0), ("b", 1000.0, 3.0)), 100.0)
    assert(r("a")._4 == 25.0 && !r("a")._5)
    assert(r("b")._4 == 75.0 && !r("b")._5)
  }

  private def epochs(rows: Seq[(String, Double, Double)], b: Double,
                     e: Int = 4, decay: Double = 0.5) =
    Mix.epochAllocation(rows.toDF("s", "c", "w"),
      col("s"), col("c"), col("w"), b, e, decay)
      .select("source", "full_epochs", "alloc", "epochs")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap

  test("epoch allocation: slabs grant in utility-density order — a " +
    "high-weight source earns its SECOND epoch before a low-weight " +
    "source earns its first") {
    // a: w=4 → utils 4,2,1,.5; b: w=1 → utils 1,.5,.25,.125; caps 100.
    // Order: a1(4), a2(2), {a3,b1 tie at 1 → source asc → a3 first}.
    // B=250: a gets 100+100+50, b gets 0.
    val r = epochs(Seq(("a", 100.0, 4.0), ("b", 100.0, 1.0)), 250.0)
    assert(r("a")._2 == 2L && r("a")._3 == 250.0 && r("a")._4 == 2.5,
      r("a"))
    assert(r("b")._2 == 0L && r("b")._3 == 0.0, r("b"))
  }

  test("epoch allocation: budget above E·Σcap grants every epoch; " +
    "Σalloc always equals min(budget, E·Σcap)") {
    val full = epochs(Seq(("a", 10.0, 1.0), ("b", 20.0, 3.0)), 1e9)
    assert(full("a")._2 == 4L && full("a")._3 == 40.0 && full("a")._4 == 4.0)
    assert(full("b")._2 == 4L && full("b")._3 == 80.0)
    val cut = epochs(Seq(("a", 10.0, 1.0), ("b", 20.0, 3.0)), 47.0)
    assert(cut.values.map(_._3).sum == 47.0, cut)
  }

  test("epoch allocation: equal weights interleave epochs round-robin " +
    "by decay level — everyone's epoch 1 precedes anyone's epoch 2") {
    // same w: utils tie per level, so level e fills for ALL sources
    // before level e+1 starts. B = Σcap + 30 → epoch 1 complete
    // everywhere, epoch 2 partial in source order (a first).
    val r = epochs(Seq(("a", 100.0, 1.0), ("b", 200.0, 1.0)), 330.0)
    assert(r("a")._2 == 1L && r("b")._2 == 1L, r)
    assert(r("a")._3 == 130.0 && r("b")._3 == 200.0, r)
  }

  test("epoch allocation: a cap=0 source earns ZERO full epochs (its " +
    "slabs satisfy alloc == cap vacuously), and full_epochs survives " +
    "non-representable decimal caps where the float equality can miss " +
    "by an ulp") {
    val z = epochs(Seq(("a", 0.0, 5.0), ("b", 100.0, 1.0)), 1e9)
    assert(z("a")._2 == 0L && z("a")._3 == 0.0 && z("a")._4 == 0.0, z("a"))
    assert(z("b")._2 == 4L, z("b"))
    // caps 0.1 are not exactly representable: after the prefix sum,
    // budget - (pc - cap) can land at cap ± ulp. The primal pc <= budget
    // condition counts the slab regardless; budget = 3 * 0.1's float sum
    // grants exactly the three slabs whose boundary fits.
    val u = epochs(Seq(("c", 0.1, 1.0)), 0.1 + 0.1 + 0.1)
    assert(u("c")._2 == 3L, u("c"))
  }

  private def doremi(rows: Seq[(String, Long)], iters: Int = 5) =
    Mix.doremiWeights(rows.toDF("source", "loss"), col("source"),
      col("loss"), iters = iters)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap

  test("doremi weights: mass moves monotonically onto the excess-loss " +
    "source, the uniform-smoothing floor holds, and total mass is " +
    "conserved up to floor residue") {
    // one hot domain (3 bits/token above the others)
    val rows = Seq(("cold1", 4000000L), ("cold2", 4000000L),
      ("hot", 7000000L), ("cold3", 4000000L))
    val w = doremi(rows)
    assert(w("hot") > 250000L, s"hot domain not upweighted: $w")
    assert(w("cold1") < 250000L && w("cold1") == w("cold2") &&
      w("cold2") == w("cold3"), s"cold symmetry broken: $w")
    // smoothing floor: 10% toward uniform guarantees >= c/k − residue
    assert(w.values.forall(_ >= 100000L / 4 - 1), s"starved domain: $w")
    val total = w.values.sum
    assert(total >= 1000000L - 16 && total <= 1000000L, s"mass: $total")
    // more rounds -> strictly more mass on the hot domain (the MW
    // ascent), saturating toward the DRO equilibrium, never past it
    val w1 = doremi(rows, iters = 1)
    val w9 = doremi(rows, iters = 9)
    assert(w1("hot") < w("hot") && w("hot") < w9("hot"),
      s"no monotone ascent: ${w1("hot")} ${w("hot")} ${w9("hot")}")
    // equal losses -> exactly uniform output (excess 0 everywhere)
    val eq = doremi(Seq(("a", 5000000L), ("b", 5000000L)))
    assert(eq("a") == eq("b"))
  }

  test("doremi fold is replay-deterministic and self-attenuating: as " +
    "weight accumulates on the hot domain the mixture average rises " +
    "and per-round gains shrink") {
    val rows = Seq(("a", 3000000L), ("b", 6000000L))
    assert(doremi(rows) == doremi(rows))
    val gains = (1 to 6).map(i => doremi(rows, iters = i)("b"))
    val deltas = gains.sliding(2).map(p => p(1) - p(0)).toSeq
    assert(deltas.zip(deltas.tail).forall { case (d1, d2) => d2 <= d1 },
      s"per-round gains not shrinking: $deltas")
  }

  private def neyman(rows: Seq[(String, Long)], b: Long) =
    Mix.neymanAllocation(rows.toDF("s", "x"), col("s"), col("x"), b)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  test("neyman: the budget apportions exactly and the varied stratum " +
    "out-draws an equally-sized homogeneous one") {
    // stratum a: constant (sd 0); stratum b: spread 0/100 (sd > 0).
    // Neyman weight n·sd puts the WHOLE budget on b; Hamilton keeps
    // Σalloc = B exactly.
    val rows = Seq(("a", 50L), ("a", 50L), ("a", 50L), ("a", 50L)) ++
      Seq(("b", 0L), ("b", 100L), ("b", 0L), ("b", 100L))
    val r = neyman(rows, 10L)
    assert(r("a")._4 == 0L && r("b")._4 == 10L, s"got $r")
    assert(r.values.map(_._4).sum == 10L)
    // sd_kilo for b: n=4, s1=200, s2=20000 →
    // (4·20000 − 200²)/(4·3) = 40000/12 = 3333.3̅ → sd = 57.7350…
    // → floor(1000·sd) = 57735
    assert(r("b")._3 == 57735L, s"sd_kilo: ${r("b")._3}")
  }

  test("neyman: all-constant strata fall back to proportional-to-n " +
    "shares with largest-remainder rounding, still summing to B") {
    // every stratum constant → Σw = 0 → proportional: n = 1/2/3 of 6,
    // B=10 → base 1/3/5 (floor of 10/6,20/6,30/6) + remainder to the
    // largest fractional part (a: 10%6=4, b: 20%6=2, c: 30%6=0) → a +1
    val rows = Seq(("a", 7L)) ++ Seq.fill(2)(("b", 7L)) ++
      Seq.fill(3)(("c", 7L))
    val r = neyman(rows, 10L)
    assert(r("a")._4 == 2L && r("b")._4 == 3L && r("c")._4 == 5L,
      s"got $r")
    assert(r.values.map(_._4).sum == 10L)
  }

  test("neyman is replay-deterministic and a singleton stratum (n=1, " +
    "undefined variance) contributes zero weight instead of an error") {
    val rows = Seq(("solo", 9000L), ("big", 10L), ("big", 990L),
      ("big", 500L))
    val r = neyman(rows, 8L)
    assert(r == neyman(rows, 8L))
    assert(r("solo")._3 == 0L, s"singleton sd must floor to 0: $r")
    assert(r.values.map(_._4).sum == 8L)
  }
}
