package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated replay of the bench's 10× scale-soak rows — the iteration
  * tool the full `graft.Bench` is too heavy for. Usage:
  *   SPARK_GRAFT_SF_DIR=… ./tools/run.sh graft.tools.SoakProbe bm25_fixedq
  * Names: bm25, bm25_fixedq, substr, pagerank, triangles. Prints one
  * JSON line per name with the 1x time, 10x time and ratio (same
  * construction as Bench.scaleSoak2, min of SPARK_GRAFT_SOAK_REPS
  * reps, default 1). */
object SoakProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SOAK_REPS", "1").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-soak-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d1 = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val d10 = d1.select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), lit(9L))).as("rep"))
      .select((col("doc_id") * 10 + col("rep")).as("doc_id"),
        concat(col("text"), lit(" rep"), col("rep")).as("text"))

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf(f: => Double): Double = (1 to reps).map(_ => f).min

    def bm25(df: org.apache.spark.sql.DataFrame, qMod: Long): Double = {
      val toks = df.select(col("doc_id"), split(col("text"), " ").as("toks"))
      val q = toks.filter(size(col("toks")) >= 11 &&
          col("doc_id") % qMod === 0)
        .select(col("doc_id").as("q_id"), explode(array_distinct(array(
          try_element_at(col("toks"), lit(3)),
          try_element_at(col("toks"), lit(7)),
          try_element_at(col("toks"), lit(11))))).as("term"))
        .filter(col("term") =!= "")
      val s = time(graft.analytics.TextAnalysis.bm25Retrieve(df,
        col("doc_id"), graft.analytics.TextAnalysis.ngrams(col("text"), 2),
        q, k = 5, excludeSelf = true).count())
      graft.analytics.Caches.clear(); s
    }
    def substr(df: org.apache.spark.sql.DataFrame): Double = {
      val s = time(graft.analytics.Dedup.substringDedup(df, col("doc_id"),
        col("text"), k = 15).count())
      graft.analytics.Caches.clear(); s
    }
    def graphEdges(n: Long) = {
      spark.range(n).select(col("id").as("src"))
        .select(col("src"), explode(sequence(lit(1L), lit(8L))).as("j"))
        .select(col("src"), ((col("src") * 31 + col("j") * 7919) % n).as("dst"))
        .filter(col("src") =!= col("dst"))
    }
    def pagerank(n: Long): Double = {
      val s = time(graft.analytics.Graph.pageRank(graphEdges(n), col("src"),
        col("dst"), iters = 10).count())
      graft.analytics.Caches.clear(); s
    }
    def triangles(n: Long): Double = {
      val s = time(graft.analytics.Graph.triangles(graphEdges(n), col("src"),
        col("dst")).count())
      graft.analytics.Caches.clear(); s
    }

    val names = if (args.isEmpty) Seq("bm25_fixedq") else args.toSeq
    names.foreach {
      case "bm25" =>
        val (a, b) = (minOf(bm25(d1, 25L)), minOf(bm25(d10, 25L)))
        println(f"""{"name":"bm25","t1":$a%.3f,"t10":$b%.3f,"ratio":${b / a}%.2f}""")
      case "bm25_fixedq" =>
        val a = minOf(bm25(d1, 25L))
        val b = minOf(bm25(d10, 250L))
        println(f"""{"name":"bm25_fixedq","t1":$a%.3f,"t10":$b%.3f,"ratio":${b / a}%.2f}""")
      case "substr" =>
        val (a, b) = (minOf(substr(d1)), minOf(substr(d10)))
        println(f"""{"name":"substr","t1":$a%.3f,"t10":$b%.3f,"ratio":${b / a}%.2f}""")
      case "pagerank" =>
        val (a, b) = (minOf(pagerank(100000L)), minOf(pagerank(1000000L)))
        println(f"""{"name":"pagerank","t1":$a%.3f,"t10":$b%.3f,"ratio":${b / a}%.2f}""")
      case "triangles" =>
        val (a, b) = (minOf(triangles(100000L)), minOf(triangles(1000000L)))
        println(f"""{"name":"triangles","t1":$a%.3f,"t10":$b%.3f,"ratio":${b / a}%.2f}""")
      case "wireformat" =>
        // encode+route+decode at 1x and 10x docs — both stages are
        // map-only, so the ratio should sit near the data ratio
        import graft.ingest.{SchemaEvolution, SchemaCompat, WireFormat}
        def wf(df: org.apache.spark.sql.DataFrame, tag: String): Double = {
          val reg = java.nio.file.Files
            .createTempDirectory(s"wf_soak_$tag").toString
          val ev = df.select(col("doc_id").as("event_id"),
            col("text").substr(1, 16).as("event_type"),
            length(col("text")).cast("long").as("cents"))
          val enc1 = WireFormat.encode(
            ev.filter(pmod(col("event_id"), lit(2)) === 0),
            Seq("event_id", "event_type"), 1, reg, Nil)
          val enc2 = WireFormat.encode(
            ev.filter(pmod(col("event_id"), lit(2)) === 1),
            Seq("event_id", "event_type", "cents"), 2, reg, Nil)
          val framed = enc1.unionByName(enc2)
          val s = time {
            val routed = WireFormat.route(framed, col("value"), Set(1, 2))
            val batches = WireFormat.versionedBatches(
              routed.ok, col("value"), reg, Nil)
            SchemaEvolution.resolve(SchemaCompat.Backward, batches.reverse)
              .map(_.frame.count()).sum
          }
          graft.analytics.Caches.clear(); s
        }
        val (a, b) = (minOf(wf(d1, "1x")), minOf(wf(d10, "10x")))
        println(f"""{"name":"wireformat","t1":$a%.3f,"t10":$b%.3f,"ratio":${b / a}%.2f}""")
      case "theilsen_banded" =>
        // linearity-in-H evidence for q69b: synthetic hourly cells at H
        // and 10H, banded (lag<=168) pair stage + histogram median.
        // q69's exact stage is O(H²) — the banded ratio should sit
        // near 10, the exact one near 100.
        def cellsOf(hours: Long) = {
          spark.range(hours).select(col("id").as("h"))
            .crossJoin(spark.range(5).select(
              concat(lit("t"), col("id")).as("event_type")))
            .select(col("event_type"), col("h"),
              ((col("h") * 131 + 17) % 100000).as("y"))
        }
        def banded(hours: Long): Double = {
          val c = cellsOf(hours)
          val a = c.select(col("event_type"), col("h").as("h1"),
            col("y").as("y1"), expr("h div 168L").as("bk"))
          val b = c.select(col("event_type"), col("h").as("h2"),
            col("y").as("y2"),
            explode(array(expr("h div 168L"),
              expr("h div 168L - 1L"))).as("bk"))
          val w = org.apache.spark.sql.expressions.Window
          val slopes = a.join(b, Seq("event_type", "bk"))
            .filter(col("h2") > col("h1") && col("h2") - col("h1") <= 168L)
            .select(col("event_type"),
              floor(((col("y2") - col("y1")) * lit(1000000L)).cast("double")
                / (col("h2") - col("h1")).cast("double")).cast("long")
                .as("sm"))
          time(slopes.groupBy(col("event_type"), col("sm"))
            .agg(count(lit(1)).as("c"))
            .groupBy(col("event_type")).agg(sum(col("c")))
            .count())
        }
        val (a, b) = (minOf(banded(2000L)), minOf(banded(20000L)))
        println(f"""{"name":"theilsen_banded","h2000":$a%.3f,"h20000":$b%.3f,"ratio":${b / a}%.2f}""")
      case "summary" =>
        // materialized summary serving: the same dashboard aggregate on
        // the base lake vs served (SummaryRewrite) at 1x and 10x rows.
        // The served time should be FLAT in lake size (summary-grain
        // scan), the base-scan time should track the data ratio; the
        // one-time summary build cost is reported alongside.
        import graft.plans.SummaryRewrite
        SummaryRewrite.install(spark)
        val ev = Tables.load(spark, sfDir, "events")
          .filter(col("ts").isNotNull)
          .select(col("event_type"),
            (weekday(col("ts").cast("date")) + lit(1)).cast("long")
              .as("dow"),
            floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
        // 100x, not 10x: the per-job fixed overhead (~0.2 s at local[32])
        // swallows a 10x scan at sf0.1 — 100x is where the scan cost
        // itself becomes visible against the flat served time
        val ev100 = ev.select(col("event_type"), col("dow"),
            col("cents"), explode(sequence(lit(0L), lit(99L))).as("rep"))
          .select(col("event_type"), col("dow"),
            (col("cents") + col("rep")).as("cents"))
        def probe(df: org.apache.spark.sql.DataFrame, tag: String)
            : (Double, Double, Double) = {
          val dir = java.nio.file.Files
            .createTempDirectory(s"sum_soak_$tag").toString
          df.write.mode("overwrite").parquet(s"$dir/base")
          val b = spark.read.parquet(s"$dir/base")
          def dash(frame: org.apache.spark.sql.DataFrame): Long =
            frame.filter(col("dow") <= 5).groupBy(col("event_type"))
              .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
                min(col("cents")).as("mn"), max(col("cents")).as("mx"))
              .collect().length.toLong
          SummaryRewrite.clear()
          val tBase = minOf(time(dash(b)))
          val tBuild = time {
            SummaryRewrite.buildSummary(b, Seq("event_type", "dow"),
                Seq("cents"))
              .coalesce(1).write.mode("overwrite").parquet(s"$dir/sum")
            0L
          }
          SummaryRewrite.register(b, spark.read.parquet(s"$dir/sum"),
            Seq("event_type", "dow"), Seq("cents"))
          val tServed = minOf(time(dash(b)))
          SummaryRewrite.clear()
          (tBase, tBuild, tServed)
        }
        val (b1, bu1, s1) = probe(ev, "1x")
        val (b100, bu100, s100) = probe(ev100, "100x")
        println(f"""{"name":"summary","base_1x":$b1%.3f,"served_1x":$s1%.3f,"build_1x":$bu1%.3f,"base_100x":$b100%.3f,"served_100x":$s100%.3f,"build_100x":$bu100%.3f,"speedup_100x":${b100 / s100}%.1f,"served_ratio":${s100 / s1}%.2f}""")
      case "bm25_profile" =>
        // stage-by-stage cost of the fixed-query 10x retrieval
        import graft.analytics.{Caches, TextAnalysis}
        val df = d10
        val toks = df.select(col("doc_id"), split(col("text"), " ").as("toks"))
        val q = toks.filter(size(col("toks")) >= 11 &&
            col("doc_id") % 250 === 0)
          .select(col("doc_id").as("q_id"), explode(array_distinct(array(
            try_element_at(col("toks"), lit(3)),
            try_element_at(col("toks"), lit(7)),
            try_element_at(col("toks"), lit(11))))).as("term"))
          .filter(col("term") =!= "")
        val t0 = Caches.persist(df.select(col("doc_id"),
          TextAnalysis.ngrams(col("text"), 2).as("toks")))
        val tTok = time(t0.count())
        val tStats = time(t0.agg(count(lit(1)), avg(size(col("toks"))))
          .collect().length.toLong)
        val qv = q.select(col("term")).distinct()
        val posts = t0
          .select(col("doc_id"), size(col("toks")).cast("double").as("dl"),
            explode(col("toks")).as("term"))
          .filter(col("term") =!= "")
          .join(broadcast(qv), Seq("term"), "left_semi")
          .groupBy(col("term"), col("doc_id"), col("dl"))
          .agg(count(lit(1)).cast("double").as("tf"))
          .withColumn("df", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("term"))).cast("double"))
        val posts2 = Caches.persist(posts)
        val tPost = time(posts2.count())
        val full = time(TextAnalysis.bm25Retrieve(df, col("doc_id"),
          TextAnalysis.ngrams(col("text"), 2), q, k = 5,
          excludeSelf = true).count())
        Caches.clear()
        println(f"""{"name":"bm25_profile","tokenize":$tTok%.3f,"stats":$tStats%.3f,"postings":$tPost%.3f,"full":$full%.3f}""")
      case other => println(s"""{"name":"$other","err":"unknown"}""")
    }
    spark.stop()
  }
}
