package graft.analytics

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CalibrateSpec extends SparkSuite {
  import spark.implicits._

  private def fit(rows: Seq[(Double, Int)], bins: Int = 16) =
    Calibrate.isotonicBins(rows.toDF("s", "y"), col("s"), col("y"), bins)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)

  test("isotonicBins pools adjacent violators to the weighted mean and " +
    "leaves satisfied constraints alone (known PAV solution)") {
    // three populated bins with raw means 0.5, 0.0, 1.0 (two rows
    // each): the 0.5 > 0.0 violation pools bins 0+1 to 1/4; bin 2
    // stays at 1. Scores 0.0/0.45/0.99 with range binning over
    // [0, 990000] land in bins 0, 7, 15.
    val rows = Seq((0.0, 1), (0.0, 0), (0.45, 0), (0.45, 0),
      (0.99, 1), (0.99, 1))
    val out = fit(rows)
    assert(out.map(_._1).toSeq == Seq(0L, 7L, 15L),
      s"bin ids: ${out.toSeq}")
    assert(out.map(_._5).toSeq == Seq(250000L, 250000L, 1000000L),
      s"PAV must pool the violating pair to 250000: ${out.toSeq}")
    assert(out.map(_._4).toSeq == Seq(500000L, 0L, 1000000L),
      s"raw means preserved for reporting: ${out.toSeq}")
  }

  test("isotonicBins is the identity on already-monotone bin means") {
    val rows = Seq((0.0, 0), (0.0, 0), (0.5, 0), (0.5, 1),
      (1.0, 1), (1.0, 1))
    val out = fit(rows)
    assert(out.forall(r => r._4 == r._5),
      s"monotone input must calibrate to itself: $out")
  }

  test("calibrated curve is nondecreasing and never worse than raw " +
    "bin means in Brier score on the LR fixture") {
    val doc = graft.Tables.load(spark, sf001, "documents")
    val w = TextAnalysis.logisticFit(doc, col("text"),
      col("lang") === "en").last
    val scored = Caches.persist(TextAnalysis.logisticScore(doc,
      col("doc_id"), col("text"), col("lang") === "en", w))
    val out = Calibrate.isotonicBins(scored, col("p"), col("y"))
      .orderBy(col("bin"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.length > 1, "range binning must spread the thin LR band")
    assert(out.sliding(2).forall(p => p.head._5 <= p.last._5),
      s"calibrated curve must be nondecreasing: ${out.toSeq}")
    // PAV is the monotone least-squares fit, so its binwise squared
    // error cannot exceed ANY monotone curve's — and the raw means are
    // not monotone here, so strict improvement is expected vs the
    // best monotone approximation of them. Compare Brier vs raw bins:
    def brier(v: Seq[(Long, Long, Long)]): Double =
      v.map { case (cnt, pos, micro) =>
        val q = micro.toDouble / 1e6
        // sum over rows in bin: pos·(1-q)² + (cnt-pos)·q²
        pos * (1 - q) * (1 - q) + (cnt - pos) * q * q
      }.sum
    val rawB = brier(out.map(r => (r._2, r._3, r._4)).toSeq)
    val calB = brier(out.map(r => (r._2, r._3, r._5)).toSeq)
    // raw bin means minimize binwise Brier by definition; the isotonic
    // fit trades a bounded amount of it for monotonicity. Pin that the
    // cost is small AND the curve differs (pooling actually happened).
    assert(out.exists(r => r._4 != r._5), "fixture must need pooling")
    assert(calB <= rawB * 1.10,
      s"isotonic fit should stay near the unconstrained optimum: " +
        s"cal $calB vs raw $rawB")
    Caches.clear()
  }

  test("range binning pins the observed extremes to the first and " +
    "last bins regardless of the score band's location") {
    // scores live in [10.0, 10.15] — nowhere near [0,1]
    val rows = (0 until 64).map(i => (10.0 + 0.15 * i / 63.0, i % 2))
    val out = fit(rows)
    assert(out.head._1 == 0L && out.last._1 == 15L,
      s"observed min/max must land in bins 0 and 15: $out")
  }

  private def rank(rows: Seq[(Double, Int)]) = {
    val r = Calibrate.rankingEval(rows.toDF("s", "y"), col("s"), col("y"))
      .collect().head
    (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
  }

  // brute-force pairwise AUC (half credit on score ties) and the
  // cell-granular AP definition, replayed in plain Scala
  private def bruteForce(rows: Seq[(Double, Int)]): (Double, Double) = {
    val ps = rows.filter(_._2 == 1).map(_._1)
    val ns = rows.filter(_._2 == 0).map(_._1)
    val auc = (for { p <- ps; n <- ns }
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum /
      (ps.size.toDouble * ns.size)
    val cells = rows.groupBy(_._1).toSeq.sortBy(-_._1)
      .map { case (_, g) => (g.size, g.count(_._2 == 1)) }
    val (ap, _, _) = cells.foldLeft((0.0, 0L, 0L)) {
      case ((acc, cp, cc), (cnt, pos)) =>
        val (cp2, cc2) = (cp + pos, cc + cnt)
        (acc + (pos.toLong * cp2 * 1000000L / cc2).toDouble, cp2, cc2)
    }
    (auc, ap / (ps.size * 1000000.0))
  }

  test("rankingEval: single-class input yields NULL auc (and NULL ap " +
    "when positives are absent) instead of NaN or a divide error — " +
    "there is no ranking to evaluate") {
    def rankRow(rows: Seq[(Double, Int)]) =
      Calibrate.rankingEval(rows.toDF("s", "y"), col("s"), col("y"))
        .collect().head
    val allPos = rankRow(Seq((0.9, 1), (0.4, 1)))
    assert(allPos.getLong(0) == 2L && allPos.getLong(1) == 0L)
    assert(allPos.isNullAt(2), "auc must be NULL with no negatives")
    assert(!allPos.isNullAt(3), "ap is defined (and 1.0) with all positives")
    assert(allPos.getDouble(3) == 1.0)
    val allNeg = rankRow(Seq((0.9, 0), (0.4, 0)))
    assert(allNeg.isNullAt(2) && allNeg.isNullAt(3),
      "both metrics undefined with no positives")
  }

  test("rankingEval: perfect separation scores AUC 1, reversal scores 0, " +
    "and an all-tied scorer sits at 0.5 with AP = base rate") {
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0))
    assert(rank(perfect)._3 == 1.0)
    assert(rank(perfect)._4 == 1.0)
    val reversed = Seq((0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1))
    assert(rank(reversed)._3 == 0.0)
    val tied = Seq((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0), (0.5, 0))
    val t = rank(tied)
    assert(t._3 == 0.5, s"all-tied AUC must be 0.5: $t")
    assert(t._4 == 0.4, s"all-tied AP is the base rate 2/5: $t")
  }

  test("rankingEval equals a brute-force pairwise replay on a mixed " +
    "corpus with duplicated scores across both classes") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { _ =>
      val s = math.round(rnd.nextDouble() * 20) / 20.0 // heavy ties
      val y = if (rnd.nextDouble() < s) 1 else 0
      (s, y)
    }
    val (wantAuc, wantAp) = bruteForce(rows)
    val got = rank(rows)
    assert(got._1 == rows.count(_._2 == 1) &&
      got._2 == rows.count(_._2 == 0))
    assert(math.abs(got._3 - wantAuc) < 1e-6,
      s"AUC ${got._3} != brute $wantAuc")
    assert(math.abs(got._4 - wantAp) < 1e-6,
      s"AP ${got._4} != brute $wantAp")
  }
}
