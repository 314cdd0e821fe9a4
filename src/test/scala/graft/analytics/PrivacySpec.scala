package graft.analytics

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Hand-counted k-anonymity / l-diversity fixtures. */
class PrivacySpec extends SparkSuite {
  import spark.implicits._

  // QI = (region, band); sensitive = diag.
  // Classes: (e,1): rows 1,2,3 (k=3, diag {x,y} l=2)
  //          (e,2): row 4      (k=1, l=1)  ← singled out
  //          (w,1): rows 5,6   (k=2, diag {x,x} l=1) ← homogeneous
  private val rows = Seq(
    ("e", 1L, "x"), ("e", 1L, "y"), ("e", 1L, "x"),
    ("e", 2L, "z"),
    ("w", 1L, "x"), ("w", 1L, "x"))
  private val qis = Seq("region" -> col("r"), "band" -> col("b"))

  test("profile: class counts, threshold masses, micro risks, and the " +
    "l floor match the hand count") {
    val p = Privacy.kAnonymityProfile(rows.toDF("r", "b", "sv"), qis,
      col("sv")).collect().head
    assert(p.getLong(0) == 3L, "n_classes")
    assert(p.getLong(1) == 6L, "n_rows")
    assert(p.getLong(2) == 1L, "k_min")
    assert(p.getLong(3) == 1L, "rows_k_lt2: only the singleton")
    assert(p.getLong(4) == 6L, "rows_k_lt5: all classes are under 5")
    assert(p.getLong(5) == 6L, "rows_k_lt10: everything")
    assert(p.getLong(6) == 166666L, "risk_lt2 = 1/6 in micros, floored")
    assert(p.getLong(7) == 1000000L, "risk_lt10 = all rows")
    assert(p.getLong(8) == 1L, "l_min: the homogeneous pair leaks")
  }

  test("histogram: one class each at k=1,2,3 with the right l floors") {
    val h = Privacy.classSizeHistogram(rows.toDF("r", "b", "sv"), qis,
      col("sv")).orderBy(col("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(h == Seq((1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 2L)), h)
  }

  test("generalization moves the histogram right: coarsening the band " +
    "QI merges the singleton into a bigger class and kills the k=1 risk") {
    val coarse = Seq("region" -> col("r"), "band" -> lit(0L))
    val p = Privacy.kAnonymityProfile(rows.toDF("r", "b", "sv"), coarse,
      col("sv")).collect().head
    assert(p.getLong(0) == 2L && p.getLong(2) == 2L, "classes (e),(w)")
    assert(p.getLong(3) == 0L, "no singled-out rows after coarsening")
  }

  private def rr(rows: Seq[(Long, String)]) =
    Privacy.randomizedResponse(rows.toDF("id", "cat"),
      col("id"), col("cat"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  test("randomizedResponse: reports conserve mass, the mechanism is " +
    "replay-deterministic, and the debias lands near the truth") {
    // skewed 2-category population: 800 'x', 200 'y'
    val rows = (0L until 800L).map(i => (i, "x")) ++
      (800L until 1000L).map(i => (i, "y"))
    val r = rr(rows)
    assert(r == rr(rows), "salted-hash mechanism must replay exactly")
    assert(r.values.map(_._2).sum == 1000L, "true counts")
    assert(r.values.map(_._3).sum == 1000L,
      "every record reports exactly one category")
    assert(r("x")._2 == 800L && r("y")._2 == 200L)
    // ~25% of reports are uniform over 2 cats, so reported 'x' pulls
    // toward 500; the debias must land within the mechanism's sampling
    // noise (σ ≈ 19/1000 here) of the truth — generous 5σ gate
    assert(math.abs(r("x")._3 - 800L) > 30L,
      s"raw reported count should be visibly biased: ${r("x")._3}")
    assert(math.abs(r("x")._5 - r("x")._4) < 100000L,
      s"debiased micro off truth by ${r("x")._6}")
    assert(r("x")._6 == math.abs(r("x")._5 - r("x")._4))
  }

  test("randomizedResponse: debias micros are the clamped exact " +
    "integers of the 4kc−N formula, and estimates floor at zero") {
    // tiny fixture: hand-check the arithmetic for k=2, N=4.
    val rows = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"))
    val r = rr(rows)
    val n = 4L; val k = 2L
    r.values.foreach { row =>
      val expected = math.max(4 * k * row._3 - n, 0L) * 1000000L /
        (3 * k * n)
      assert(row._5 == expected, s"est_micro mismatch: $row")
      assert(row._5 >= 0L)
    }
    assert(r.values.map(_._3).sum == n)
  }
}
