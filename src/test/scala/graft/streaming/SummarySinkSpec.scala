package graft.streaming

import graft.SparkSuite
import graft.plans.SummaryRewrite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** The streaming summary-maintenance sink: per-micro-batch delta slices,
  * exactly-once commit markers, and a merged read that equals the batch
  * one-shot summary over the same rows — the freshness half of the
  * SummaryRewrite contract. */
class SummarySinkSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("cat", StringType),
    StructField("cents", LongType)))

  private val dims = Seq("cat")
  private val meas = Seq("cents")

  test("streamed delta slices merge to the batch one-shot summary; " +
    "uncommitted slices are invisible; resume lands only new batches") {
    val src = Files.createTempDirectory("sumsink_src").toString
    val out = Files.createTempDirectory("sumsink_out").toString
    val ckpt = Files.createTempDirectory("sumsink_ckpt").toString

    def rows(lo: Int, hi: Int) = (lo until hi).map(i =>
      (s"c${i % 3}", if (i % 7 == 0) null
      else java.lang.Long.valueOf((i * 13 % 100 - 20).toLong)))
      .toDF("cat", "cents")

    rows(0, 40).coalesce(1).write.mode("append").parquet(src)
    rows(40, 70).coalesce(1).write.mode("append").parquet(src)

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    StreamingIngest.startSummarySink(stream, dims, meas, out, ckpt)
      .awaitTermination(60000)

    val slices = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).sorted
    assert(slices.length >= 2, slices.toSeq.toString) // one per file trigger

    def mergedRows() = StreamingIngest.readSummary(spark, out, dims, meas)
      .collect().map(_.toString).sorted.toSeq
    val oneShot = SummaryRewrite.buildSummary(
        spark.read.parquet(src), dims, meas)
      .collect().map(_.toString).sorted.toSeq
    assert(mergedRows() == oneShot)

    // a crashed attempt's partial slice (no _SUCCESS) must never merge
    val zombie = new java.io.File(out, "batch_id=99")
    SummaryRewrite.buildSummary(rows(0, 10), dims, meas)
      .coalesce(1).write.parquet(zombie.toString)
    new java.io.File(zombie, "_SUCCESS").delete()
    assert(mergedRows() == oneShot)

    // resume under the same checkpoint: only the NEW file lands, as a
    // new committed slice, and the merged summary tracks the full base
    rows(70, 100).coalesce(1).write.mode("append").parquet(src)
    StreamingIngest.startSummarySink(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(src), dims, meas, out, ckpt)
      .awaitTermination(60000)
    val after = SummaryRewrite.buildSummary(
        spark.read.parquet(src), dims, meas)
      .collect().map(_.toString).sorted.toSeq
    assert(mergedRows() == after)

    // and the maintained summary SERVES: register it for the base scan
    // and the dashboard aggregate answers from the written summary
    val servable = s"$out/servable"
    StreamingIngest.readSummary(spark, out, dims, meas)
      .coalesce(1).write.mode("overwrite").parquet(servable)
    SummaryRewrite.install(spark)
    SummaryRewrite.clear()
    SummaryRewrite.register(spark.read.parquet(src),
      spark.read.parquet(servable), dims, meas)
    val q = spark.read.parquet(src).groupBy(col("cat"))
      .agg(sum(col("cents")).as("s"), count(lit(1)).as("n"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("servable"), plan)
    val got = q.collect().map(_.toString).sorted.toSeq
    SummaryRewrite.clear()
    assert(got == q.collect().map(_.toString).sorted.toSeq)
  }

  test("startPipeline(summarize=...) maintains the summary in the SAME " +
    "micro-batch as the lake write: merged slices equal the landed " +
    "lake's one-shot summary") {
    import graft.ingest.{IngestConfig, PartitionerSpec}
    val src = Files.createTempDirectory("pipe_sum_src").toString
    val out = Files.createTempDirectory("pipe_sum_out").toString
    val ckpt = Files.createTempDirectory("pipe_sum_ckpt").toString
    val sch = StructType(Seq(
      StructField("kafka_partition", IntegerType),
      StructField("offset", LongType),
      StructField("event_type", StringType),
      StructField("cents", LongType)))
    (0 until 2).foreach { b =>
      (0L until 20L).map(i => (0, b * 20 + i, s"t${i % 3}",
        java.lang.Long.valueOf((i * 31 % 90 - 10))))
        .toDF("kafka_partition", "offset", "event_type", "cents")
        .coalesce(1).write.mode("append").parquet(src)
    }
    StreamingIngest.startPipeline(
        spark.readStream.schema(sch).option("maxFilesPerTrigger", 1)
          .parquet(src),
        IngestConfig(topic = "ss", flushSize = 100),
        PartitionerSpec.Fields(Seq("event_type")), out, ckpt,
        col("kafka_partition"), col("offset"),
        payloadCols = Seq(col("offset"), col("event_type"), col("cents")),
        summarize = Some((Seq("event_type"), Seq("cents"),
          s"$out/summary_slices")))
      .awaitTermination(60000)
    val lake = spark.read.parquet(s"$out/topics/ss/*")
    val oneShot = SummaryRewrite.buildSummary(
        lake.select(col("event_type"), col("cents")),
        Seq("event_type"), Seq("cents"))
      .collect().map(_.toString).sorted.toSeq
    val merged = StreamingIngest.readSummary(spark,
        s"$out/summary_slices", Seq("event_type"), Seq("cents"))
      .collect().map(_.toString).sorted.toSeq
    assert(merged == oneShot)
  }

  test("HLL sink: streamed register deltas merge to the batch one-shot " +
    "registers (idempotent under replay) and serve a coarse-grain " +
    "distinct estimate bit-equal to a direct build") {
    val src = Files.createTempDirectory("hllsink_src").toString
    val out = Files.createTempDirectory("hllsink_out").toString
    val ckpt = Files.createTempDirectory("hllsink_ckpt").toString
    val sch = StructType(Seq(
      StructField("cat", StringType), StructField("uid", StringType)))
    (0 until 3).foreach { b =>
      (0 until 60).map(i => (s"c${i % 2}", s"u${(b * 60 + i) * 13 % 97}"))
        .toDF("cat", "uid").coalesce(1).write.mode("append").parquet(src)
    }
    StreamingIngest.startHllSummarySink(
        spark.readStream.schema(sch).option("maxFilesPerTrigger", 1)
          .parquet(src), Seq("cat"), col("uid"), out, ckpt)
      .awaitTermination(60000)
    val merged = StreamingIngest.readHllSummary(spark, out, Seq("cat"))
      .collect().map(_.toString).sorted.toSeq
    val oneShot = SummaryRewrite.buildHllSummary(
        spark.read.parquet(src), Seq("cat"), col("uid"))
      .collect().map(_.toString).sorted.toSeq
    assert(merged == oneShot)
    // served estimates off the maintained registers == direct estimates
    val est = SummaryRewrite.serveHll(
        StreamingIngest.readHllSummary(spark, out, Seq("cat")), Seq("cat"))
      .collect().map(_.toString).sorted.toSeq
    val direct = graft.analytics.Sketches.hllDistinct(
        spark.read.parquet(src), col("cat"), col("uid"))
      .collect().map(_.toString).sorted.toSeq
    // column names differ (cat vs grp) — compare the value payloads
    assert(est.map(_.split(",").last) == direct.map(_.split(",").last))
  }

  test("histogram sink: streamed value-grain slices merge to the batch " +
    "one-shot histogram and serve an exact median") {
    val src = Files.createTempDirectory("histsink_src").toString
    val out = Files.createTempDirectory("histsink_out").toString
    val ckpt = Files.createTempDirectory("histsink_ckpt").toString
    (0 until 3).foreach { b =>
      (0 until 50).map(i => (s"c${i % 2}",
        java.lang.Long.valueOf(((b * 50 + i) * 7 % 40).toLong)))
        .toDF("cat", "cents").coalesce(1).write.mode("append").parquet(src)
    }
    StreamingIngest.startHistSummarySink(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(src), dims, "cents", out, ckpt)
      .awaitTermination(60000)
    val merged = StreamingIngest.readHistSummary(spark, out, dims)
      .collect().map(_.toString).sorted.toSeq
    val oneShot = SummaryRewrite.buildHistSummary(
        spark.read.parquet(src), dims, "cents")
      .collect().map(_.toString).sorted.toSeq
    assert(merged == oneShot)

    val servable = s"$out/servable"
    StreamingIngest.readHistSummary(spark, out, dims)
      .coalesce(1).write.mode("overwrite").parquet(servable)
    SummaryRewrite.install(spark)
    SummaryRewrite.clear()
    SummaryRewrite.registerHist(spark.read.parquet(src),
      spark.read.parquet(servable), dims, "cents")
    def q = spark.read.parquet(src).groupBy(col("cat"))
      .agg(expr("percentile(cents, 0.5)").as("med"))
    val qd = q
    qd.collect()
    assert(qd.queryExecution.executedPlan.toString.contains("servable"))
    val got = qd.collect().map(_.toString).sorted.toSeq
    SummaryRewrite.clear()
    assert(got == q.collect().map(_.toString).sorted.toSeq)
  }
}
