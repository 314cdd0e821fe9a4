package graft.analytics

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSuite {
  import spark.implicits._

  test("kmvDistinct: exact below k, estimate within the statistical " +
    "band above k, deterministic") {
    // group 'small' has 40 < k=64 distinct items -> exact count
    // group 'big' has 5000 distinct items -> KMV estimate; k=64 gives
    // ~1/sqrt(64) = 12.5% standard error, so 40% is a generous pin
    // that still catches an off-by-2x estimator bug
    val df = ((1 to 40).map(i => ("small", s"s$i")) ++
      (1 to 5000).map(i => ("big", s"b$i"))).toDF("grp", "it")
    val out = Sketches.kmvDistinct(df, col("grp"), col("it"), k = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("small") == 40L, out)
    val est = out("big")
    assert(est > 3000 && est < 7000, s"KMV estimate $est for 5000")
    // duplicates change nothing: the sketch sees distinct hashes
    val dup = df.union(df).union(df)
    val out2 = Sketches.kmvDistinct(dup, col("grp"), col("it"), k = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out2 == out)
  }

  test("kmvDistinct: bucket pruning is exact — matches the unpruned " +
    "window at every bucket count") {
    val df = (1 to 2000).map(i => ("g", s"x$i")).toDF("grp", "it")
    val ests = Seq(1, 8, 64).map { nb =>
      Sketches.kmvDistinct(df, col("grp"), col("it"), k = 32,
        nBuckets = nb).head.getLong(1)
    }
    // nBuckets=1 IS the unpruned global window
    assert(ests.distinct.size == 1, s"pruning changed the estimate: $ests")
  }

  test("cm sketch: never underestimates, exact when collision-free, " +
    "collisions only add") {
    val items = (1 to 300).flatMap(i => Seq.fill(i % 7 + 1)(s"t$i"))
      .toDF("it")
    val exact = items.groupBy(col("it")).agg(count(lit(1)).as("c"))
    // wide grid: 300 items over 4x8192 cells -> expect mostly exact
    val wide = Sketches.cmCells(items, col("it"), lit(1L), d = 4, w = 8192)
    val estW = Sketches.cmEstimate(wide, exact, col("it"), d = 4, w = 8192)
    val w0 = exact.withColumnRenamed("it", "g")
      .join(estW, col("g") === col("it"))
      .select(col("g"), col("c"), col("est")).collect()
    assert(w0.forall(r => r.getLong(2) >= r.getLong(1)),
      "CM underestimated")
    assert(w0.count(r => r.getLong(2) == r.getLong(1)) >= 280,
      "wide grid should be nearly collision-free")
    // narrow grid: heavy collisions, still never below exact
    val narrow = Sketches.cmCells(items, col("it"), lit(1L), d = 2, w = 16)
    val estN = Sketches.cmEstimate(narrow, exact, col("it"), d = 2, w = 16)
    val n0 = exact.withColumnRenamed("it", "g")
      .join(estN, col("g") === col("it"))
      .select(col("g"), col("c"), col("est")).collect()
    assert(n0.forall(r => r.getLong(2) >= r.getLong(1)),
      "CM underestimated under collisions")
    assert(n0.exists(r => r.getLong(2) > r.getLong(1)),
      "16-column grid over 300 items must collide somewhere")
  }

  test("hllDistinct: estimates inside the statistical band across three " +
    "orders of magnitude, duplicate-insensitive, deterministic") {
    // p=9 -> sigma ~ 4.6%; 20% is a generous pin that still catches an
    // off-by-2x estimator or a broken register rank. 30 hits linear
    // counting, 5000 the raw harmonic path.
    val df = ((1 to 30).map(i => ("tiny", s"t$i")) ++
      (1 to 700).map(i => ("mid", s"m$i")) ++
      (1 to 5000).map(i => ("big", s"b$i"))).toDF("grp", "it")
    val out = Sketches.hllDistinct(df, col("grp"), col("it"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((g, n) <- Seq("tiny" -> 30L, "mid" -> 700L, "big" -> 5000L)) {
      val e = out(g)
      assert(math.abs(e - n).toDouble / n <= 0.20,
        s"$g: est $e for true $n is outside the band")
    }
    // max over registers is idempotent: duplicates change nothing
    val out2 = Sketches.hllDistinct(df.union(df).union(df),
      col("grp"), col("it"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out2 == out, s"duplicates moved the estimate: $out2 vs $out")
  }

  test("hllDistinct: the linear-counting switch engages exactly on the " +
    "standard rule (empty buckets present AND raw <= 2.5m)") {
    // 30 distinct items cannot fill 512 buckets -> the estimate must be
    // a value from the precomputed lc table, not the raw harmonic mean
    val df = (1 to 30).map(i => ("g", s"x$i")).toDF("grp", "it")
    val est = Sketches.hllDistinct(df, col("grp"), col("it"))
      .collect().head.getLong(1)
    val lc = Sketches.hllLcTable(9)
    assert(lc.contains(est),
      s"small-range estimate $est must come from the lc table")
    // and the table itself is the documented function of V
    assert(lc(511) == 0L && lc.head == math.round(512.0 * math.log(512.0)),
      "lc table endpoints wrong")
  }

  test("HLL registers merge exactly: slice-and-merge equals single-pass " +
    "even with overlapping slices, and estimates stay within band") {
    val items = (1 to 2000).map(i => ("g", s"item$i"))
    val df = items.toDF("grp", "it")
    val even = df.filter(expr("CAST(substr(it, 5) AS INT) % 2 = 0"))
    // OVERLAPPING slices: odd ∪ (multiples of 3) — max is idempotent,
    // so double-counted items must not perturb the merge
    val oddAnd3 = df.filter(expr(
      "CAST(substr(it, 5) AS INT) % 2 = 1 OR " +
        "CAST(substr(it, 5) AS INT) % 3 = 0"))
    val merged = Sketches.hllFromRegisters(Sketches.hllMergeRegisters(Seq(
        Sketches.hllRegisters(even, col("grp"), col("it")),
        Sketches.hllRegisters(oddAnd3, col("grp"), col("it")))))
      .collect().head.getLong(1)
    val single = Sketches.hllDistinct(df, col("grp"), col("it"))
      .collect().head.getLong(1)
    assert(merged == single,
      s"merge must be exact: merged=$merged single=$single")
    assert(math.abs(merged - 2000.0) / 2000.0 < 0.15,
      s"estimate $merged out of band for 2000 distinct")
  }

  test("count-min cells merge exactly over DISJOINT slices, and an " +
    "overlapping slice overcounts (sum is linear, not idempotent)") {
    val df = (1 to 600).map(i => (i.toLong, s"w${i % 37}"))
      .toDF("id", "it").withColumn("one", lit(1L))
    def cells(f: org.apache.spark.sql.DataFrame) =
      Sketches.cmCells(f, col("it"), col("one"))
    val merged = Sketches.cmMergeCells(Seq(
        cells(df.filter(col("id") % 2 === 0)),
        cells(df.filter(col("id") % 2 === 1))))
      .collect()
      .map(r => (r.get(0).toString, r.get(1).toString) -> r.getLong(2))
      .toMap
    val single = cells(df)
      .collect()
      .map(r => (r.get(0).toString, r.get(1).toString) -> r.getLong(2))
      .toMap
    assert(merged == single, "disjoint-slice merge must equal single pass")
    // overlap: the even half twice — every cell doubles, total mass 2×
    val over = Sketches.cmMergeCells(Seq(
        cells(df.filter(col("id") % 2 === 0)),
        cells(df.filter(col("id") % 2 === 0))))
      .agg(sum("cell")).collect().head.getLong(0)
    val evenMass = cells(df.filter(col("id") % 2 === 0))
      .agg(sum("cell")).collect().head.getLong(0)
    assert(over == 2 * evenMass, "overlap must double-count, by design")
  }

  test("kmvOverlap: exact when both sides fit under k, within band on a " +
    "planted 1000-item overlap, and zero for disjoint sets") {
    // small sets (< k): no hk, theta = 2^60, c IS the exact intersection
    val small = ((1 to 50).map(i => ("a", s"x$i")) ++
      (26 to 80).map(i => ("b", s"x$i"))).toDF("grp", "it")
    val sSig = Sketches.kmvSignature(small, col("grp"), col("it"), k = 256)
    val sGot = Sketches.kmvOverlap(sSig, k = 256)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(sGot(("a", "b")) == 25L,
      s"sub-k sides must be exact: $sGot")

    // large sets: A = 1..3000, B = 2001..5000 (overlap 1000), C disjoint
    val big = ((1 to 3000).map(i => ("A", s"w$i")) ++
      (2001 to 5000).map(i => ("B", s"w$i")) ++
      (9001 to 9800).map(i => ("C", s"z$i"))).toDF("grp", "it")
    val bSig = Sketches.kmvSignature(big, col("grp"), col("it"), k = 512)
    val got = Sketches.kmvOverlap(bSig, k = 512)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val ab = got(("A", "B"))
    assert(math.abs(ab - 1000.0) / 1000.0 < 0.3,
      s"planted 1000-overlap estimate $ab out of band")
    assert(got(("A", "C")) == 0L && got(("B", "C")) == 0L,
      s"disjoint pairs must estimate 0: $got")
  }

  test("quantileProfile = type-1 order statistics against a sorted-array " +
    "replay, duplicates and two groups included") {
    // group a: 1..10 (clean ranks); group b: heavy duplication so the
    // histogram path (counts per distinct value) is actually exercised
    val va = (1L to 10L).toSeq
    val vb = Seq(2L, 2L, 2L, 2L, 7L, 7L, 9L)
    val df = (va.map(("a", _)) ++ vb.map(("b", _))).toDF("g", "v")
    val out = Sketches.quantileProfile(df, col("g"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    def t1(vs: Seq[Long], num: Int, den: Int): Long = {
      val s = vs.sorted
      s(((vs.length * num + den - 1) / den) - 1) // ceil(q*n), 1-based
    }
    def quad(vs: Seq[Long]) = (vs.length.toLong,
      t1(vs, 1, 4), t1(vs, 1, 2), t1(vs, 3, 4), t1(vs, 19, 20))
    assert(out("a") == quad(va), s"a: ${out("a")} vs ${quad(va)}")
    assert(out("b") == quad(vb), s"b: ${out("b")} vs ${quad(vb)}")
    // spot-check the hand numbers: n=10 -> p25 = rank ceil(2.5)=3 -> 3,
    // p95 = rank ceil(9.5)=10 -> 10; duplicated group: p25 = rank 2 -> 2,
    // p50 = rank 4 -> 2, p75 = rank ceil(5.25)=6 -> 7, p95 = rank 7 -> 9
    assert(out("a") == ((10L, 3L, 5L, 8L, 10L)))
    assert(out("b") == ((7L, 2L, 2L, 7L, 9L)))
  }
}
