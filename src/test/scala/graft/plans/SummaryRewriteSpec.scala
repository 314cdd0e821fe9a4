package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The materialized summary-table rewrite: registered aggregates answer
  * from the summary scan (plan-asserted), unregistered or untranslatable
  * shapes keep the base scan, and every rewritten result is value-equal
  * to the base-scan execution of the same query. */
class SummaryRewriteSpec extends SparkSuite {
  import spark.implicits._

  private val root = new java.io.File(
    System.getProperty("java.io.tmpdir"), "graft_sumrw_spec").getPath

  // (cat, dow, cents, score): null dims and an all-null measure group so
  // the rollup algebra's null edges are all exercised.
  private lazy val fixture: DataFrame = {
    SummaryRewrite.install(spark)
    val rows = (0 until 400).map { i =>
      val cat = if (i % 7 == 0) null else s"c${i % 3}"
      val dow = if (i % 11 == 0) null
      else java.lang.Long.valueOf((i % 5).toLong)
      // c2 rows with dow=4 carry only null cents (all-null measure group)
      val cents = if (i % 3 == 2 && i % 5 == 4) null
      else java.lang.Long.valueOf((i * 37 % 1000 - 200).toLong)
      (cat, dow, cents, i.toDouble / 8.0)
    }
    val df = rows.toDF("cat", "dow", "cents", "score")
    df.write.mode("overwrite").parquet(s"$root/base")
    val base = spark.read.parquet(s"$root/base")
    SummaryRewrite.buildSummary(base, Seq("cat", "dow"),
        Seq("cents", "score"))
      .write.mode("overwrite").parquet(s"$root/sum2")
    SummaryRewrite.buildSummary(base, Seq("cat"), Seq("cents"))
      .write.mode("overwrite").parquet(s"$root/sum1")
    SummaryRewrite.buildHistSummary(base, Seq("cat", "dow"), "cents")
      .write.mode("overwrite").parquet(s"$root/hist1")
    base
  }

  private def base: DataFrame = { fixture; spark.read.parquet(s"$root/base") }

  private def registerAll(): Unit = {
    fixture
    SummaryRewrite.clear()
    SummaryRewrite.register(base, spark.read.parquet(s"$root/sum2"),
      Seq("cat", "dow"), Seq("cents", "score"))
    SummaryRewrite.register(base, spark.read.parquet(s"$root/sum1"),
      Seq("cat"), Seq("cents"))
    SummaryRewrite.registerHist(base, spark.read.parquet(s"$root/hist1"),
      Seq("cat", "dow"), "cents")
  }

  private def scanOf(df: DataFrame): String = {
    df.collect() // finalize under AQE before reading the plan
    df.queryExecution.executedPlan.toString
  }

  /** Run `q` registered and unregistered; assert the registered plan
    * scanned `wantScan` and both executions agree row-for-row. */
  private def served(q: => DataFrame, wantScan: String): Unit = {
    registerAll()
    val plan = scanOf(q)
    assert(plan.contains(wantScan), plan)
    val got = q.collect().map(_.toString).sorted
    SummaryRewrite.clear()
    val plainPlan = scanOf(q)
    assert(!plainPlan.contains("sum1") && !plainPlan.contains("sum2") &&
      !plainPlan.contains("hist1"), plainPlan)
    val want = q.collect().map(_.toString).sorted
    assert(got.sameElements(want),
      s"served=${got.mkString("|")} base=${want.mkString("|")}")
  }

  test("full-grain battery serves from the 2-dim summary and matches " +
    "the base execution (null dims, all-null measure group included)") {
    served(
      base.filter(col("dow") <= 3 || col("dow").isNull)
        .groupBy(col("cat"))
        .agg(count(lit(1)).as("n"),
          count(col("cents")).as("n_cents"),
          sum(col("cents")).as("sum_cents"),
          min(col("cents")).as("min_cents"),
          max(col("cents")).as("max_cents"),
          countDistinct(col("dow")).as("n_dow"),
          count(col("dow")).as("dow_nonnull"),
          avg(col("cents")).as("avg_cents"),
          expr("avg(cents) FILTER (WHERE dow <= 1)").as("early_avg"),
          expr("sum(cents) FILTER (WHERE dow <= 1)").as("early_cents"))
        .orderBy(col("cat")),
      "sum2")
  }

  test("coarser query picks the 1-dim summary; a dow reference falls " +
    "back to the 2-dim grain") {
    registerAll()
    val byCat = base.groupBy(col("cat"))
      .agg(sum(col("cents")).as("s"), count(lit(1)).as("n"))
    assert(scanOf(byCat).contains("sum1"), scanOf(byCat))
    val byCatDowFilter = base.filter(col("dow") === 2)
      .groupBy(col("cat")).agg(sum(col("cents")).as("s"))
    assert(scanOf(byCatDowFilter).contains("sum2"), scanOf(byCatDowFilter))
    // and the 1-dim summary cannot serve a score aggregate
    val score = base.groupBy(col("cat")).agg(sum(col("score")).as("s"))
    assert(scanOf(score).contains("sum2"), scanOf(score))
  }

  test("grouping by an expression over a dim is exact (summary grain " +
    "partitions finer than the regrouping)") {
    served(
      base.groupBy((col("dow") % 2).as("dow_par"))
        .agg(sum(col("cents")).as("s"), max(col("cents")).as("mx"),
          count(lit(1)).as("n"))
        .orderBy(col("dow_par")),
      "sum2")
  }

  test("global aggregate (no grouping) serves from the summary") {
    served(
      base.agg(sum(col("cents")).as("s"), count(lit(1)).as("n"),
        min(col("cents")).as("mn"), countDistinct(col("cat")).as("k")),
      "sum1")
  }

  test("one summary serving twice in one query gets fresh expression ids") {
    registerAll()
    val a = base.groupBy(col("cat")).agg(sum(col("cents")).as("s_all"))
    val b = base.filter(col("cat") =!= "c1").groupBy(col("cat"))
      .agg(count(lit(1)).as("n_rest"))
    val joined = a.join(b, Seq("cat")).orderBy(col("cat"))
    val plan = scanOf(joined)
    assert(plan.contains("sum1"), plan)
    val got = joined.collect().map(_.toString).sorted
    SummaryRewrite.clear()
    val want = joined.collect().map(_.toString).sorted
    assert(got.sameElements(want))
  }

  test("untranslatable shapes keep the base scan: measure filter, " +
    "derived-measure agg, double-measure avg, distinct avg, sum over " +
    "a dim, distinct measure") {
    registerAll()
    val shapes = Seq(
      base.filter(col("cents") > 0).groupBy(col("cat"))
        .agg(sum(col("cents")).as("s")),
      base.groupBy(col("cat")).agg(sum(col("cents") * 2).as("s")),
      // double measure: base Average is addition-order-dependent, so
      // serving it could not reproduce bit-exactly — stays on base
      base.groupBy(col("cat")).agg(avg(col("score")).as("a")),
      base.groupBy(col("cat"))
        .agg(expr("avg(DISTINCT cents)").as("a")),
      base.groupBy(col("cat")).agg(sum(col("dow")).as("s")),
      base.groupBy(col("cat"))
        .agg(sum_distinct(col("cents")).as("s")),
      // no histogram registered for score → percentile stays on base
      base.groupBy(col("cat"))
        .agg(expr("percentile(score, 0.5)").as("p")))
    shapes.foreach { q =>
      val plan = scanOf(q)
      assert(!plan.contains("sum1") && !plan.contains("sum2") &&
        !plan.contains("hist1"), plan)
    }
  }

  test("re-registering the same grain replaces it (refresh), and clear " +
    "disables the rewrite") {
    registerAll()
    // stale refresh drill: rebuild sum1 after appending rows, re-register
    val extra = Seq(("c9", java.lang.Long.valueOf(1L),
      java.lang.Long.valueOf(77L), 0.5)).toDF("cat", "dow", "cents", "score")
    extra.write.mode("append").parquet(s"$root/base")
    try {
      val baseNow = spark.read.parquet(s"$root/base")
      SummaryRewrite.buildSummary(baseNow, Seq("cat"), Seq("cents"))
        .write.mode("overwrite").parquet(s"$root/sum1b")
      SummaryRewrite.register(baseNow, spark.read.parquet(s"$root/sum1b"),
        Seq("cat"), Seq("cents"))
      val q = baseNow.groupBy(col("cat")).agg(sum(col("cents")).as("s"))
      val plan = scanOf(q)
      assert(plan.contains("sum1b") && !plan.contains("sum1/"), plan)
      val got = q.collect().map(_.toString).sorted
      SummaryRewrite.clear()
      assert(got.sameElements(q.collect().map(_.toString).sorted))
    } finally {
      // restore the original fixture for other tests (order-independent)
      base.filter(col("cat").isNull || col("cat") =!= "c9")
        .write.mode("overwrite").parquet(s"$root/base2")
      spark.read.parquet(s"$root/base2").write.mode("overwrite")
        .parquet(s"$root/base")
      SummaryRewrite.clear()
    }
  }

  test("rollup over dims serves from the summary: the Expand re-bases " +
    "on summary rows, the grouping-set algebra is untouched") {
    served(
      base.rollup(col("cat"), col("dow"))
        .agg(sum(col("cents")).as("s"), count(lit(1)).as("n"),
          min(col("cents")).as("mn"), count(col("cents")).as("nc"),
          count(col("dow")).as("nd"), avg(col("cents")).as("av"))
        .orderBy(col("cat"), col("dow")),
      "sum2")
  }

  test("cube with a dim filter and a distinct dim count serves; a " +
    "distinct MEASURE through rollup keeps the base scan") {
    served(
      base.filter(col("dow") <= 3).cube(col("cat"))
        .agg(max(col("cents")).as("mx"),
          countDistinct(col("dow")).as("k"),
          count(lit(1)).as("n"))
        .orderBy(col("cat")),
      "sum2")
    registerAll()
    val bad = base.rollup(col("cat"))
      .agg(countDistinct(col("cents")).as("k"))
    val plan = scanOf(bad)
    assert(!plan.contains("sum1") && !plan.contains("sum2"), plan)
  }

  test("percentile / median / distinct-measure count serve from the " +
    "HISTOGRAM kind (the shapes the rollup kind declines), bit-exact " +
    "vs the base execution") {
    served(
      base.groupBy(col("cat")).agg(
        expr("percentile(cents, 0.5)").as("med"),
        expr("percentile(cents, array(0.25, 0.9))").as("qs"),
        expr("median(cents)").as("med2"),
        countDistinct(col("cents")).as("k"),
        sum(col("cents")).as("s"),
        count(lit(1)).as("n"),
        count(col("cents")).as("nc"),
        min(col("cents")).as("mn"),
        // avg composes from the hist kind's own sum (Σ v·cnt) and
        // count translations — integral v only, same exactness argument
        avg(col("cents")).as("av"))
        .orderBy(col("cat")),
      "hist1")
    // a mixed dim+measure distinct tuple is a single distinct group:
    // still one Aggregate, still servable at hist grain
    served(
      base.groupBy(col("cat"))
        .agg(countDistinct(col("dow"), col("cents")).as("k2"))
        .orderBy(col("cat")),
      "hist1")
    // TWO distinct groups Expand via RewriteDistinctAggregates before
    // this rule runs — expected safe fallback to the base scan
    registerAll()
    val twoDistinct = base.groupBy(col("cat"))
      .agg(countDistinct(col("cents")).as("k"),
        countDistinct(col("dow"), col("cents")).as("k2"))
    val p2 = scanOf(twoDistinct)
    assert(!p2.contains("hist1") && !p2.contains("sum1") &&
      !p2.contains("sum2"), p2)
    // the rollup kind is still preferred when it CAN serve
    registerAll()
    val flatOnly = base.groupBy(col("cat")).agg(sum(col("cents")).as("s"))
    assert(scanOf(flatOnly).contains("sum1"), scanOf(flatOnly))
  }

  test("SQL over a temp view and HAVING clauses serve: view inlining " +
    "exposes the same scan, HAVING filters sit above the rewrite") {
    registerAll()
    base.createOrReplaceTempView("sumrw_base")
    val q = spark.sql(
      """SELECT cat, sum(cents) AS s, count(*) AS n, avg(cents) AS av
        |FROM sumrw_base
        |WHERE dow <= 3 GROUP BY cat HAVING avg(cents) > -1e18
        |ORDER BY cat""".stripMargin)
    val plan = scanOf(q)
    assert(plan.contains("sum2"), plan)
    val got = q.collect().map(_.toString).sorted
    SummaryRewrite.clear()
    val want = q.collect().map(_.toString).sorted
    assert(got.sameElements(want))
  }

  test("hive-partitioned base lake: partition columns serve as dims, " +
    "and explainServing names the grain") {
    fixture
    base.write.mode("overwrite").partitionBy("cat")
      .parquet(s"$root/pbase")
    val pb = spark.read.parquet(s"$root/pbase")
    SummaryRewrite.buildSummary(pb, Seq("cat", "dow"), Seq("cents"))
      .write.mode("overwrite").parquet(s"$root/psum")
    SummaryRewrite.clear()
    SummaryRewrite.register(pb, spark.read.parquet(s"$root/psum"),
      Seq("cat", "dow"), Seq("cents"))
    def q = pb.filter(col("cat") === "c1").groupBy(col("dow"))
      .agg(sum(col("cents")).as("s"), count(lit(1)).as("n"))
    val qd = q
    qd.collect()
    assert(qd.queryExecution.executedPlan.toString.contains("psum"))
    val explain = SummaryRewrite.explainServing(qd)
    assert(explain.contains("served rollup dims=[cat,dow]"), explain)
    val got = qd.collect().map(_.toString).sorted
    SummaryRewrite.clear()
    assert(got.sameElements(q.collect().map(_.toString).sorted))
  }

  test("catalog save/load: a fresh registry re-registers from the " +
    "parquet catalog and serves identically; stale() flags a mutated " +
    "base and stays quiet on an untouched one") {
    registerAll()
    val catDir = s"$root/catalog"
    SummaryRewrite.save(spark, catDir)
    SummaryRewrite.clear()
    // def, not val: a Dataset caches its QueryExecution, so the plan
    // must be rebuilt after load() to see the re-registered summaries
    def q = base.groupBy(col("cat")).agg(sum(col("cents")).as("s"))
    assert(!scanOf(q).contains("sum1")) // registry is empty
    SummaryRewrite.load(spark, catDir)
    assert(scanOf(q).contains("sum1"), scanOf(q))
    assert(SummaryRewrite.stale().isEmpty, SummaryRewrite.stale().toString)
    // mutate the base: every registration over it must flag stale
    val extra = Seq(("c0", java.lang.Long.valueOf(2L),
      java.lang.Long.valueOf(5L), 0.1)).toDF("cat", "dow", "cents", "score")
    extra.write.mode("append").parquet(s"$root/base")
    try {
      val flagged = SummaryRewrite.stale()
      assert(flagged.nonEmpty && flagged.forall(_._1.exists(
        _.contains("graft_sumrw_spec"))), flagged.toString)
    } finally {
      // score is never null and 0.1 is not in the i/8.0 lattice, so
      // this filter removes exactly the planted row (null-safe)
      base.filter(col("score") =!= 0.1)
        .write.mode("overwrite").parquet(s"$root/base2")
      spark.read.parquet(s"$root/base2").write.mode("overwrite")
        .parquet(s"$root/base")
      SummaryRewrite.clear()
    }
  }

  test("load() restores the SAVED fingerprint: a base mutated between " +
    "save and load is flagged stale, not silently re-baselined") {
    registerAll()
    val catDir = s"$root/catalog_fp"
    SummaryRewrite.save(spark, catDir)
    SummaryRewrite.clear()
    // mutate the base BEFORE load — the tripwire's hardest case
    val extra = Seq(("c0", java.lang.Long.valueOf(2L),
      java.lang.Long.valueOf(5L), 0.1)).toDF("cat", "dow", "cents", "score")
    extra.write.mode("append").parquet(s"$root/base")
    try {
      SummaryRewrite.load(spark, catDir)
      val flagged = SummaryRewrite.stale()
      assert(flagged.nonEmpty,
        "stale() stayed silent on a base mutated between save and load")
      assert(flagged.forall(_._1.exists(_.contains("graft_sumrw_spec"))),
        flagged.toString)
    } finally {
      base.filter(col("score") =!= 0.1)
        .write.mode("overwrite").parquet(s"$root/base2")
      spark.read.parquet(s"$root/base2").write.mode("overwrite")
        .parquet(s"$root/base")
      SummaryRewrite.clear()
    }
  }

  test("refreshOnUpsert: group-scoped IVM equals the full rebuild after " +
    "a cross-group MERGE (rows move between groups, null-dim groups, " +
    "new groups appear, replaced minima recompute)") {
    val oldBase = (0 until 300).map { i =>
      (i.toLong, if (i % 7 == 0) null else s"g${i % 4}",
        if (i % 5 == 0) null
        else java.lang.Long.valueOf((i * 13 % 100).toLong), 1L)
    }.toDF("id", "cat", "cents", "version")
    // every 6th row: repriced AND moved to a different (sometimes brand
    // new) group — its old group must recompute too
    val upd = oldBase.filter(col("id") % 6 === 0)
      .withColumn("cat",
        concat(lit("g"), ((col("id") / 6) % 5).cast("string")))
      .withColumn("cents", coalesce(col("cents"), lit(0L)) + 1000L)
      .withColumn("version", lit(2L))
    val newBase = graft.ingest.Compaction.upsert(
      oldBase, upd, Seq("id"), "version")
    val refreshed = SummaryRewrite.refreshOnUpsert(
        oldBase, newBase, upd, Seq("id"),
        SummaryRewrite.buildSummary(oldBase, Seq("cat"), Seq("cents")),
        Seq("cat"), Seq("cents"))
      .collect().map(_.toString).sorted
    val full = SummaryRewrite.buildSummary(newBase, Seq("cat"),
        Seq("cents"))
      .collect().map(_.toString).sorted
    assert(refreshed.sameElements(full))
  }

  test("mergeHistSummaries over slices equals the one-shot histogram") {
    fixture
    val slices = (0 until 3).map(k =>
      SummaryRewrite.buildHistSummary(
        base.filter(pmod(col("cents"), lit(3)) === k ||
          (col("cents").isNull && lit(k) === 0)),
        Seq("cat"), "cents"))
      .reduce(_.unionByName(_))
    val merged = SummaryRewrite.mergeHistSummaries(slices, Seq("cat"))
      .collect().map(_.toString).sorted
    val oneShot = SummaryRewrite.buildHistSummary(base, Seq("cat"), "cents")
      .collect().map(_.toString).sorted
    assert(merged.sameElements(oneShot))
  }

  test("median under ROLLUP serves from the histogram kind: the Expand " +
    "re-bases on hist rows with (v, cnt) passthroughs") {
    served(
      base.rollup(col("cat"))
        .agg(expr("percentile(cents, 0.5)").as("med"),
          count(lit(1)).as("n"), sum(col("cents")).as("s"),
          countDistinct(col("cents")).as("k"),
          // avg through the Expand + HIST path: Σ v·cnt over Σ nonnull
          // cnt — the one avg shape the flat batteries can't reach
          avg(col("cents")).as("av"))
        .orderBy(asc_nulls_first("cat")),
      "hist1")
  }

  test("percentile over base JOIN dim serves from the histogram kind " +
    "through the star path") {
    fixture
    Seq(("c0", "east"), ("c1", "west"), ("c2", "east"))
      .toDF("cat", "region")
      .write.mode("overwrite").parquet(s"$root/dim2")
    val dimT = spark.read.parquet(s"$root/dim2")
    served(
      base.join(dimT, Seq("cat"))
        .groupBy(col("region"))
        .agg(expr("percentile(cents, 0.5)").as("med"),
          count(lit(1)).as("n"))
        .orderBy(col("region")),
      "hist1")
  }

  test("star join: aggregates over base JOIN dim serve from summary " +
    "JOIN dim — grouping by dim-table columns, m_count multiplicity") {
    fixture
    Seq(("c0", "east"), ("c1", "west"), ("c2", "east"), ("zz", "north"))
      .toDF("cat", "region")
      .write.mode("overwrite").parquet(s"$root/dim")
    val dimT = spark.read.parquet(s"$root/dim")
    served(
      base.join(dimT, Seq("cat"))
        .filter(col("region") =!= "north")
        .groupBy(col("region"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
          countDistinct(col("cat")).as("k"),
          min(col("cents")).as("mn"),
          count(col("cents")).as("nc"),
          count(col("region")).as("nr"),
          avg(col("cents")).as("av"))
        .orderBy(col("region")),
      "sum1")
    // left outer with the base preserved serves; base on the inner
    // side of an outer join must fall back (unmatched dim rows would
    // surface once but carry no m_count)
    served(
      base.join(dimT, Seq("cat"), "left")
        .groupBy(col("region"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
        .orderBy(col("region")),
      "sum1")
    registerAll()
    val qr = base.join(dimT, Seq("cat"), "right")
      .groupBy(col("region")).agg(count(lit(1)).as("n"))
    val pr = scanOf(qr)
    assert(!pr.contains("sum1") && !pr.contains("sum2") &&
      !pr.contains("hist1"), pr)
  }

  test("star join with an ALIASED join key in the base stem: the join " +
    "condition inlines like aboveConds, so the rewritten plan resolves " +
    "and serves (a view's SELECT cat AS ck then JOIN ON ck = ...)") {
    fixture
    Seq(("c0", "east"), ("c1", "west"), ("c2", "east"))
      .toDF("cat", "region")
      .write.mode("overwrite").parquet(s"$root/dim3")
    val dimT = spark.read.parquet(s"$root/dim3")
    served(
      base.select(col("cat").as("ck"), col("cents"))
        .join(dimT, col("ck") === dimT("cat"))
        .groupBy(col("region"))
        .agg(sum(col("cents")).as("s"), count(lit(1)).as("n"),
          min(col("cents")).as("mn"))
        .orderBy(col("region")),
      "sum1")
  }

  test("seeded randomized equivalence: random data, random grouping/" +
    "filter/agg shapes — every SERVED result equals the base execution") {
    fixture
    val rnd = new scala.util.Random(41)
    var servedCount = 0
    (0 until 4).foreach { round =>
      val n = 120 + rnd.nextInt(200)
      val rows = (0 until n).map { _ =>
        val cat = if (rnd.nextInt(6) == 0) null else s"r${rnd.nextInt(4)}"
        val dow = if (rnd.nextInt(9) == 0) null
        else java.lang.Long.valueOf(rnd.nextInt(4).toLong)
        val cents = if (rnd.nextInt(5) == 0) null
        else java.lang.Long.valueOf((rnd.nextInt(400) - 100).toLong)
        (cat, dow, cents, rnd.nextDouble())
      }
      val dir = s"$root/prop$round"
      rows.toDF("cat", "dow", "cents", "score")
        .write.mode("overwrite").parquet(s"$dir/base")
      val b = spark.read.parquet(s"$dir/base")
      SummaryRewrite.buildSummary(b, Seq("cat", "dow"), Seq("cents"))
        .write.mode("overwrite").parquet(s"$dir/sum")
      SummaryRewrite.buildHistSummary(b, Seq("cat", "dow"), "cents")
        .write.mode("overwrite").parquet(s"$dir/hist")

      val aggPool = Seq(
        () => sum(col("cents")).as(s"a${rnd.nextInt(1000)}"),
        () => count(lit(1)).as(s"a${rnd.nextInt(1000)}"),
        () => count(col("cents")).as(s"a${rnd.nextInt(1000)}"),
        () => count(col("dow")).as(s"a${rnd.nextInt(1000)}"),
        () => min(col("cents")).as(s"a${rnd.nextInt(1000)}"),
        () => max(col("cents")).as(s"a${rnd.nextInt(1000)}"),
        () => avg(col("cents")).as(s"a${rnd.nextInt(1000)}"),
        () => countDistinct(col("dow")).as(s"a${rnd.nextInt(1000)}"),
        () => expr("percentile(cents, 0.5)").as(s"a${rnd.nextInt(1000)}"),
        () => countDistinct(col("cents")).as(s"a${rnd.nextInt(1000)}"))
      (0 until 3).foreach { _ =>
        val aggs = Seq.fill(1 + rnd.nextInt(3))(
          aggPool(rnd.nextInt(aggPool.length))())
        val grouped = rnd.nextInt(4) match {
          case 0 => b.groupBy(col("cat"))
          case 1 => b.groupBy(col("cat"), (col("dow") % 2).as("dp"))
          case 2 => b.rollup(col("cat"), col("dow"))
          case _ => b.filter(col("dow") <= 2 || col("dow").isNull)
            .groupBy(col("dow"))
        }
        def q = grouped.agg(aggs.head, aggs.tail: _*)
        SummaryRewrite.clear()
        SummaryRewrite.register(b, spark.read.parquet(s"$dir/sum"),
          Seq("cat", "dow"), Seq("cents"))
        SummaryRewrite.registerHist(b, spark.read.parquet(s"$dir/hist"),
          Seq("cat", "dow"), "cents")
        val qd = q
        val served = qd.collect().map(_.toString).sorted
        val p = qd.queryExecution.executedPlan.toString
        if (p.contains("/sum") || p.contains("/hist")) servedCount += 1
        SummaryRewrite.clear()
        val plain = q.collect().map(_.toString).sorted
        assert(served.sameElements(plain),
          s"round=$round aggs=${aggs.mkString(",")}\n" +
            s"served=${served.mkString("|")}\nplain=${plain.mkString("|")}")
      }
    }
    // the property must not pass vacuously: most shapes should rewrite
    assert(servedCount >= 6, s"only $servedCount/12 shapes served")
  }

  test("HLL register summary: serving a COARSER grain is bit-equal to a " +
    "direct build at that grain (register max refolds exactly), and " +
    "slice merge is idempotent under overlap") {
    fixture
    val withUid = base.withColumn("uid",
      concat(lit("u"), pmod(coalesce(col("cents"), lit(0L)) * 7, lit(23))
        .cast("string")))
    val hll = SummaryRewrite.buildHllSummary(withUid, Seq("cat", "dow"),
      col("uid"))
    val served = SummaryRewrite.serveHll(hll, Seq("cat"))
      .collect().map(r => (r.get(0), r.getLong(1))).sortBy(_.toString)
    val direct = graft.analytics.Sketches.hllDistinct(
        withUid, col("cat"), col("uid"))
      .collect().map(r => (r.get(0), r.getLong(1))).sortBy(_.toString)
    assert(served.sameElements(direct),
      s"served=${served.mkString("|")} direct=${direct.mkString("|")}")
    // estimates land near truth (23 distinct uids at most, all groups)
    val exact = withUid.groupBy(col("cat"))
      .agg(countDistinct(col("uid")).as("k"))
      .collect().map(r => (r.get(0), r.getLong(1))).toMap
    served.foreach { case (cat, est) =>
      val k = exact(cat)
      assert(math.abs(est - k) <= math.max(3L, k / 4),
        s"cat=$cat est=$est exact=$k")
    }
    // OVERLAPPING slices merge safely: max is idempotent
    val again = SummaryRewrite.mergeHllSummaries(hll.unionByName(hll),
        Seq("cat", "dow"))
      .collect().map(_.toString).sorted
    assert(again.sameElements(hll.collect().map(_.toString).sorted))
  }

  test("CM cell summary: per-dim grids fold to the global grain exactly " +
    "(linearity — dims partition the rows) and estimates only " +
    "over-approximate") {
    fixture
    val sk = graft.analytics.Sketches
    val weighted = base.filter(col("cents").isNotNull)
      .withColumn("it",
        concat(lit("t"), pmod(col("cents"), lit(17)).cast("string")))
      .groupBy(col("cat"), col("it"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    val perCat = sk.cmCellsBy(weighted, Seq("cat"), col("it"), col("cnt"))
    val folded = perCat.groupBy(col("r"), col("c"))
      .agg(sum(col("cell")).cast("long").as("cell"))
      .collect().map(_.toString).sorted
    val direct = sk.cmCells(
        weighted.groupBy(col("it")).agg(sum(col("cnt")).cast("long")
          .as("cnt")), col("it"), col("cnt"))
      .collect().map(_.toString).sorted
    assert(folded.sameElements(direct))
    val exact = weighted.groupBy(col("it"))
      .agg(sum(col("cnt")).cast("long").as("exact"))
    val est = sk.cmEstimateBy(perCat, Nil, exact, col("it"))
    exact.join(est.withColumnRenamed("it", "itx"),
        col("it") === col("itx"))
      .select(col("it"), col("exact"), col("est"))
      .collect().foreach { r =>
        assert(r.getLong(2) >= r.getLong(1), r.toString)
      }
  }

  test("mergeSummaries over arbitrary slices equals the one-shot summary") {
    fixture
    val slices = (0 until 3).map(k =>
      SummaryRewrite.buildSummary(
        base.filter(pmod(col("cents"), lit(3)) === k ||
          (col("cents").isNull && lit(k) === 0)),
        Seq("cat", "dow"), Seq("cents", "score")))
      .reduce(_.unionByName(_))
    val merged = SummaryRewrite.mergeSummaries(slices, Seq("cat", "dow"),
        Seq("cents", "score"))
      .collect().map(_.toString).sorted
    val oneShot = SummaryRewrite.buildSummary(base, Seq("cat", "dow"),
        Seq("cents", "score"))
      .collect().map(_.toString).sorted
    assert(merged.sameElements(oneShot))
  }
}
