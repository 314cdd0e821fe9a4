package graft

import org.apache.spark.sql.functions._

/** Smoke: every registered query runs at sf0.001; every oracle key has a
  * query; flagship entry returns rows. */
class QueriesSpec extends SparkSuite {

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // noop write, NOT count(): Catalyst prunes unused projections under
  // count(), so a throwing column (e.g. an ANSI DIVIDE_BY_ZERO) stays
  // invisible — the round-11 q52 escape. The noop sink materializes
  // every output column end-to-end.
  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      fn(spark, sf0001).write.format("noop").mode("overwrite").save()
    }
  }

  test("eval_conformal: the realized marginal coverage sits at the 1-α " +
    "guarantee (within finite-sample slack), sets are non-degenerate, " +
    "and q̂ is one global threshold") {
    val rows = SparkEntry.queries("eval_conformal")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L))
    val n = rows.map(_._2).sum
    // weighted marginal coverage in micros; the conformal guarantee is
    // ≥ 1−α in EXPECTATION over calibration draws — a fixed split's
    // realization may dip slightly below .9, so gate at .85
    val cov = rows.map(r => r._2 * r._3).sum / n
    assert(cov >= 850000L, s"marginal coverage $cov below slack gate")
    // binary task: every prediction set holds 1 or 2 labels
    assert(rows.forall(r => r._4 >= 1000000L && r._4 <= 2000000L),
      s"degenerate set sizes: ${rows.toSeq}")
    assert(rows.map(_._5).distinct.length == 1,
      "q̂ must be one global calibration threshold")
    graft.analytics.Caches.clear()
  }

  test("q71 MWU: the histogram-window rank statistic equals a " +
    "brute-force tie-aware rank computation on the collected per-user " +
    "totals (independent of the DuckDB oracle)") {
    import spark.implicits._
    val perUser = Tables.load(spark, sf0001, "events")
      .select(col("user_id"), col("event_type"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("cents")).as("cents"))
      .as[(Long, String, Long)].collect()
    val got = SparkEntry.queries("q71_mwu")(spark, sf0001)
      .as[(String, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    perUser.groupBy(_._2).foreach { case (seg, rows) =>
      val a = rows.filter(_._1 % 2 == 0).map(_._3).sorted
      val b = rows.filter(_._1 % 2 == 1).map(_._3).sorted
      val all = (a ++ b).sorted
      // tie-aware average rank of value v (1-based), doubled
      def r2(v: Long): Long = {
        val lt = all.count(_ < v); val eq = all.count(_ == v)
        2L * lt + eq + 1L
      }
      val u2 = a.map(r2).sum - a.length.toLong * (a.length + 1L)
      val (na, nb, n) = (a.length.toLong, b.length.toLong,
        all.length.toLong)
      val tie = all.groupBy(identity).values
        .map(g => g.length.toLong).map(c => c * c * c - c).sum
      val varU = na.toDouble * nb.toDouble / 12.0 *
        ((n.toDouble + 1.0) - tie.toDouble /
          (n.toDouble * (n.toDouble - 1.0)))
      val z = (u2.toDouble - na.toDouble * nb.toDouble) /
        (2.0 * math.sqrt(varU))
      val g = got(seg)
      assert(g._2 == na && g._3 == nb && g._4 == u2,
        s"$seg: got $g want ($na,$nb,$u2)")
      assert(math.abs(g._5.get - z) < 1e-5, s"$seg: z ${g._5} want $z")
    }
  }

  test("q73 KS: d_micro equals the brute-force max ECDF gap on " +
    "collected values, and the rejection matches the exact squared " +
    "criterion") {
    import spark.implicits._
    val ev = Tables.load(spark, sf0001, "events")
      .select(col("event_type"),
        dayofmonth(col("ts").cast("timestamp")).as("day"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .as[(String, Int, Long)].collect()
    val got = SparkEntry.queries("q73_ks_drift")(spark, sf0001)
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    ev.groupBy(_._1).foreach { case (seg, rows) =>
      val h1 = rows.filter(_._2 <= 15).map(_._3)
      val h2 = rows.filter(_._2 > 15).map(_._3)
      val (n1, n2) = (h1.length.toLong, h2.length.toLong)
      val dmax = (h1 ++ h2).distinct.map { v =>
        math.abs(h1.count(_ <= v).toLong * n2 -
          h2.count(_ <= v).toLong * n1)
      }.max
      val g = got(seg)
      assert(g._2 == n1 && g._3 == n2, s"$seg: $g")
      assert(g._4 == dmax * 1000000L / (n1 * n2),
        s"$seg: d_micro ${g._4} want ${dmax * 1000000L / (n1 * n2)}")
      val rej = if (dmax.toDouble * dmax.toDouble >
        1.844164 * (n1 + n2).toDouble * n1.toDouble * n2.toDouble) 1L
      else 0L
      assert(g._5.contains(rej), s"$seg: reject ${g._5} want $rej")
    }
  }

  test("q74 W1: w1_micro equals the brute-force transport integral " +
    "over collected values — and the all-mass-shifted sanity bound " +
    "W1 <= max - min holds") {
    import spark.implicits._
    val ev = Tables.load(spark, sf0001, "events")
      .select(col("event_type"),
        dayofmonth(col("ts").cast("timestamp")).as("day"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .as[(String, Int, Long)].collect()
    val got = SparkEntry.queries("q74_wasserstein")(spark, sf0001)
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    ev.groupBy(_._1).foreach { case (seg, rows) =>
      val h1 = rows.filter(_._2 <= 15).map(_._3)
      val h2 = rows.filter(_._2 > 15).map(_._3)
      val (n1, n2) = (h1.length.toLong, h2.length.toLong)
      val vs = (h1 ++ h2).distinct.sorted
      val w1num = vs.zip(vs.tail).map { case (v, nxt) =>
        BigInt((h1.count(_ <= v).toLong * n2 -
          h2.count(_ <= v).toLong * n1).abs) * (nxt - v)
      }.sum
      val want = (w1num * 1000000 / (BigInt(n1) * n2)).toLong
      val g = got(seg)
      assert(g._2 == n1 && g._3 == n2 && g._4.contains(want),
        s"$seg: got $g want w1_micro=$want")
      val range = (vs.last - vs.head) * 1000000L
      assert(g._4.get <= range, s"$seg: W1 ${g._4} exceeds range $range")
    }
  }

  test("q72 BH-FDR: the step-up decision is internally consistent — " +
    "rejections are exactly the prefix of the p-ascending order up to " +
    "i*, every rejected p clears its own i·α/m line via some later " +
    "rank, and no accepted rank below i* exists") {
    import spark.implicits._
    val rows = SparkEntry.queries("q72_bh_fdr")(spark, sf0001)
      .select(col("p"), col("p_rank"), col("reject"))
      .as[(Double, Long, Long)].collect().sortBy(_._2)
    val m = rows.length.toDouble
    val passing = rows.filter(r => r._1 * m <= r._2 * 0.05).map(_._2)
    if (passing.isEmpty) assert(rows.forall(_._3 == 0L))
    else {
      val iStar = passing.max
      rows.foreach { case (_, i, rej) =>
        assert(rej == (if (i <= iStar) 1L else 0L), s"rank $i")
      }
    }
    // monotone: p is non-decreasing in rank
    assert(rows.map(_._1).sliding(2).forall(
      w => w.length < 2 || w(0) <= w(1)))
  }

  test("smoke discipline: a throwing projection escapes count() but is " +
    "caught by the noop write — the exact hazard the smoke must cover") {
    import org.apache.spark.sql.functions._
    val df = spark.range(3)
      .select(col("id"), (lit(1) / (col("id") - col("id"))).as("boom"))
    assert(df.count() == 3) // count() prunes `boom`: silently green
    intercept[Exception] {
      df.write.format("noop").mode("overwrite").save()
    }
  }

  test("embedding drift: a planted +0.5 shift on dimension 3 of the odd " +
    "slice is the ONLY flagged dimension, with the right sign") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_embdrift_spec"
    // 40 vectors, 64 dims; deterministic within-slice jitter on every
    // dim (variance > 0), plus a +0.5 level shift on dim 3 (index 2)
    // for odd vec_ids only
    val rows = (0L until 40L).map { i =>
      val base = (0 until 64).map(j => ((i * 7 + j) % 5).toFloat * 0.01f)
      val e = if (i % 2 == 1) base.updated(2, base(2) + 0.5f) else base
      (i, e)
    }
    rows.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.queries.ContentQueries
      .queries("profile_emb_drift")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 64)
    val flagged = out.filter(_._2.getLong(6) == 1L).keySet
    assert(flagged == Set(3L), s"flagged dims: $flagged")
    assert(out(3L).getDouble(5) > 0.0, out(3L)) // live - ref > 0
    // unshifted dims: identical jitter pattern per slice pair-up isn't
    // guaranteed, but the smd must stay under the 0.1 boundary
    assert(out.filterKeys(_ != 3L).values.forall(r =>
      r.isNullAt(5) || math.abs(r.getDouble(5)) <= 0.1))
  }

  test("power/MDE: hand-computed moments on a planted 4-user metric, " +
    "and the n=1 / zero-mean guards yield NULL rather than a throw") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_power_spec"
    // clicks: users 1-4 at 1.00/2.00/3.00/4.00 -> cents 100..400;
    // views: ONE user (n=1 -> variance undefined -> NULL tail)
    (Seq((1L, "click", 1.0), (2L, "click", 2.0), (3L, "click", 3.0),
      (4L, "click", 4.0), (5L, "view", 1.0)))
      .toDF("user_id", "event_type", "value")
      .withColumn("ts", lit(base)).withColumn("event_id", col("user_id"))
      .withColumn("props", lit(""))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = graft.queries.RelationalQueries
      .queries("q67_power_mde")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val c = rows("click")
    // n=4, s1=1000, s2=300000: mean 2_500_000 micro;
    // var = (4*300000 - 1000^2)/12 = 200000/12
    assert(c.getLong(1) == 4L && c.getLong(2) == 2500000L, c)
    val varR = BigDecimal(200000.0 / 12.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(c.getDouble(3) == varR, c)
    // n_arm=2: mde = zsum * sqrt(2*var/2); delta = 12.5 cents
    val mde = BigDecimal(2.801585 * math.sqrt(2.0 * varR / 2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(c.getDouble(4) == mde, c)
    val nReq = math.ceil(2.0 * varR * 7.848878 / (12.5 * 12.5)).toLong
    assert(c.getLong(5) == nReq && nReq == 1675L, c)
    val v = rows("view")
    assert(v.getLong(1) == 1L && v.getLong(2) == 1000000L, v)
    assert(v.isNullAt(3) && v.isNullAt(4) && v.isNullAt(5), v)
    // '_all' collapses per-user across types: 5 users, same 100..400
    // cents plus the view user's 100
    assert(rows("_all").getLong(1) == 5L, rows("_all"))
  }

  test("abtest: an all-converters table (zero chi2 marginal) yields " +
    "NULL chi2, not a DIVIDE_BY_ZERO throw; a mixed table yields the " +
    "hand-computed statistic") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(h: Int) = new java.sql.Timestamp(base.getTime + h * 3600000L)
    def run(rows: Seq[(Long, String, java.sql.Timestamp)]) = {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_abtest_spec"
      rows.toDF("user_id", "event_type", "ts")
        .withColumn("event_id", col("user_id"))
        .withColumn("value", lit(0.0)).withColumn("props", lit(""))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      graft.queries.RelationalQueries.queries("q52_abtest")(spark, dir)
        .collect().head
    }
    // every user views@0 then purchases@1 -> all convert -> the
    // (n - conv) marginal is 0 -> chi2 must be NULL (DuckDB's 0/0)
    val allConv = run(Seq(
      (0L, "view", t(0)), (0L, "purchase", t(1)),
      (1L, "view", t(0)), (1L, "purchase", t(1))))
    assert(allConv.getLong(0) == 1L && allConv.getLong(1) == 1L)
    assert(allConv.isNullAt(6), allConv)
    // arm A converts 1/2, arm B 0/1; purchase@50h is OUTSIDE the 48 h
    // window so u2 must NOT count. 2x2 = (a=1,b=1,c=0,d=1):
    // chi2 = 3*(1*1-0*1)^2/(2*1*1*2) = 0.75
    val mixed = run(Seq(
      (0L, "view", t(0)), (0L, "purchase", t(1)),
      (2L, "view", t(0)), (2L, "purchase", t(50)),
      (1L, "view", t(0))))
    assert(mixed.getLong(0) == 2L && mixed.getLong(1) == 1L &&
      mixed.getLong(2) == 1L && mixed.getLong(3) == 0L, mixed)
    assert(mixed.getDouble(6) == 0.75, mixed)
  }

  test("funnel stages demand strict event ORDER, not mere presence") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // u1 completes in order; u2 purchased BEFORE clicking (stage 2 only);
    // u3 never clicked (stage 1 only); u4 never viewed (no stage)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new java.sql.Timestamp(base.getTime + m * 60000L)
    val ev = Seq(
      (1L, "view", t(0)), (1L, "click", t(1)), (1L, "purchase", t(2)),
      (2L, "purchase", t(0)), (2L, "view", t(1)), (2L, "click", t(2)),
      (3L, "view", t(0)), (3L, "error", t(1)),
      (4L, "click", t(0)), (4L, "purchase", t(1)))
      .toDF("user_id", "event_type", "ts")
      .withColumn("event_id", col("user_id"))
      .withColumn("value", lit(0.0)).withColumn("props", lit(""))
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_funnel_spec"
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.RelationalQueries.queries("q47_funnel")(
      spark, dir).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("1_view" -> 3L, "2_click" -> 2L, "3_purchase" -> 1L),
      out)
  }

  test("user churn: new + returning = users per hour, first hours sum " +
    "to the distinct-user total, and a planted return is counted") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(h: Int) = new java.sql.Timestamp(base.getTime + h * 3600000L)
    // u1 appears hours 0,1,2; u2 hours 0,2; u3 only hour 1; duplicate
    // events within an hour must not double-count
    val ev = Seq((1L, t(0)), (1L, t(0)), (1L, t(1)), (1L, t(2)),
      (2L, t(0)), (2L, t(2)), (3L, t(1)))
      .toDF("user_id", "ts")
      .withColumn("event_type", lit("view"))
      .withColumn("event_id", col("user_id"))
      .withColumn("value", lit(0.0)).withColumn("props", lit(""))
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_churn_spec"
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = graft.queries.RelationalQueries.queries("q50_user_churn")(
      spark, dir).collect()
      .map(r => r.getString(0).substring(11, 13).toInt ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows == Map(0 -> ((2L, 2L, 0L)), 1 -> ((2L, 1L, 1L)),
      2 -> ((2L, 0L, 2L))), rows)
    assert(rows.values.forall { case (u, n, r) => u == n + r })
    assert(rows.values.map(_._2).sum == 3L) // every user new exactly once
  }

  test("rank AUC formula: the doubled-rank histogram statistic equals " +
    "brute-force concordant-pair counting (ties worth half) on a " +
    "planted tied score set") {
    import org.apache.spark.sql.functions._
    val win = org.apache.spark.sql.expressions.Window
    // scores with ties ACROSS classes (pm=30 has one of each)
    val rows = Seq((1L, 10L), (0L, 10L), (1L, 30L), (0L, 30L),
      (1L, 50L), (0L, 20L), (1L, 50L), (0L, 40L), (1L, 25L))
    val brute = {
      val pos = rows.filter(_._1 == 1L).map(_._2)
      val neg = rows.filter(_._1 == 0L).map(_._2)
      val s = (for (p <- pos; q <- neg) yield
        if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
      s / (pos.size * neg.size)
    }
    import spark.implicits._
    val sc = rows.toDF("y", "pm")
    val hist = sc.groupBy(col("pm"))
      .agg(count(when(col("y") === 1L, lit(1))).cast("long").as("np"),
        count(when(col("y") === 0L, lit(1))).cast("long").as("nn"))
      .withColumn("c", col("np") + col("nn"))
      .withColumn("cum", sum(col("c")).over(win.orderBy(col("pm"))))
      .withColumn("r2", lit(2L) * col("cum") - col("c") + lit(1L))
    val got = hist.agg(
        sum(col("np")).cast("long").as("n_pos"),
        sum(col("nn")).cast("long").as("n_neg"),
        sum(col("np").cast("decimal(38,0)") * col("r2"))
          .cast("decimal(38,0)").as("r2p"))
      .select(expr("CAST(((r2p - CAST(n_pos AS DECIMAL(38,0))" +
        " * (n_pos + 1L)) * 1000000) div" +
        " (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)"))
      .head().getLong(0)
    assert(got == math.floor(brute * 1e6).toLong,
      s"rank AUC $got != brute ${brute * 1e6}")
  }

  test("q69b banded Theil-Sen: the lag-bucket equi join enumerates each " +
    "<=168 h pair EXACTLY once — n_pairs and the median equal the " +
    "plain lag-filtered cross join on the real fixture") {
    import org.apache.spark.sql.functions._
    val win = org.apache.spark.sql.expressions.Window
    val cells = graft.Tables.load(spark, sf0001, "events")
      .select(col("event_type"),
        expr("unix_micros(date_trunc('hour', cast(ts as timestamp)))" +
          " div 3600000000").as("h"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
      .groupBy(col("event_type"), col("h"))
      .agg(sum(col("cents")).cast("long").as("y"))
    val a = cells.select(col("event_type"), col("h").as("h1"),
      col("y").as("y1"))
    val b = cells.select(col("event_type"), col("h").as("h2"),
      col("y").as("y2"))
    // reference: the O(T²) join with the band as a plain filter
    val slopes = a.join(b, Seq("event_type"))
      .filter(col("h2") > col("h1") && col("h2") - col("h1") <= 168L)
      .select(col("event_type"),
        floor(((col("y2") - col("y1")) * lit(1000000L)).cast("double")
          / (col("h2") - col("h1")).cast("double")).cast("long").as("sm"))
    val hist = slopes.groupBy(col("event_type"), col("sm"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        win.partitionBy(col("event_type")).orderBy(col("sm"))))
      .withColumn("n", sum(col("c")).over(
        win.partitionBy(col("event_type"))))
    val want = hist.groupBy(col("event_type"))
      .agg(max(col("n")).cast("long").as("n_pairs"),
        round((
          min(when(col("cum") >= expr("(n + 1L) div 2L"), col("sm"))) +
          min(when(col("cum") >= expr("(n + 2L) div 2L"), col("sm"))))
          / 2.0, 1).as("slope_med_micro"))
      .orderBy(col("event_type")).collect().map(_.toSeq).toSeq
    val got = graft.queries.RelationalQueries.queries(
      "q69b_theil_sen_banded")(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    assert(got == want, s"banded equi-key != lag-filtered reference:" +
      s"\n$got\n$want")
  }

  test("funnel: a planted 4-user timeline — full in-window conversion, " +
    "an out-of-window click, a pre-view click, and a dropout — lands " +
    "each user in exactly the right stage") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(h: Int) = new java.sql.Timestamp(base.getTime + h * 3600000L)
    val ev = Seq(
      // u1: view@0, click@1, purchase@2 — full conversion
      (1L, t(0), "view"), (1L, t(1), "click"), (1L, t(2), "purchase"),
      // u2: view@0, click@50 — outside the 48 h window: stops at view
      (2L, t(0), "view"), (2L, t(50), "click"),
      // u3: click@0 BEFORE its first view@1 — the pre-view click must
      // not count; the in-window click@2 carries it to stage 2 only
      (3L, t(0), "click"), (3L, t(1), "view"), (3L, t(2), "click"),
      // u4: view only
      (4L, t(0), "view"))
      .toDF("user_id", "ts", "event_type")
      .withColumn("event_id", col("user_id"))
      .withColumn("value", lit(0.0)).withColumn("props", lit(""))
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_funnel_spec"
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = graft.queries.RelationalQueries.queries("q51_funnel")(
      spark, dir).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(rows == Map("all_users" -> 4L, "view" -> 4L,
      "click_after_view" -> 2L, "purchase_after_click" -> 1L), rows)
  }
}
