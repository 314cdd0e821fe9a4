package graft.ingest

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Config-driven end-to-end (Ingest.run), K4 nested partitioning, W4
  * ByteArray format, W10 commit manifest, R10 diagnostics. */
class IngestSpec extends SparkSuite {
  import spark.implicits._

  private def freshDir() = Files.createTempDirectory("ingest_e2e").toString

  test("config-driven pipeline: tombstone-aware field partitioner + null " +
    "write behavior + manifest + diagnostics") {
    val out = freshDir()
    val df = (0L until 12L).map { o =>
      (0, o, if (o % 4 == 0) null else s"v$o", s"t${o % 2}")
    }.toDF("kafka_partition", "offset", "value", "event_type")
    val cfg = IngestConfig(topic = "cfg", flushSize = 100,
      nullBehavior = RecordViews.WriteNulls)
    val result = Ingest.run(df, cfg,
      PartitionerSpec.TombstoneAware(
        PartitionerSpec.Fields(Seq("event_type")), "value"),
      out, payloadCols = Seq(col("offset"), col("value"), col("event_type")),
      valueColumnForNulls = Some("value"), writeManifest = true)
    assert(result.files.map(_.encodedPartition).distinct.sorted ==
      Seq("event_type=t0", "event_type=t1", "tombstone"))
    assert(result.stats.totalFiles == result.files.size)
    assert(result.stats.diagnostic.contains("partitions"))
    // W10: manifest rows carry offsets + counts per object key
    val manifest = scala.io.Source.fromFile(
      s"$out/topics/cfg/_graft_manifest/commit.json").getLines().toSeq
    assert(manifest.size == result.files.size)
    assert(manifest.forall(l => l.contains("\"record_count\":") &&
      l.contains("\"start_offset\":")))
  }

  test("config-driven ignore-nulls drops tombstones before partitioning") {
    val out = freshDir()
    val df = Seq((0, 0L, null.asInstanceOf[String], "a"),
      (0, 1L, "v1", "a")).toDF("kafka_partition", "offset", "value", "f")
    val cfg = IngestConfig(topic = "ign") // IgnoreNulls default
    val result = Ingest.run(df, cfg, PartitionerSpec.Fields(Seq("f")), out,
      payloadCols = Seq(col("offset"), col("value")),
      valueColumnForNulls = Some("value"))
    val back = spark.read.parquet(result.files.head.path)
    assert(back.count() == 1)
  }

  test("K4 nested-field partitioner: dotted path resolves into the struct " +
    "(TopicPartitionWriterTest.java:2897-2960)") {
    val df = Seq((16, "x"), (17, "y"))
      .toDF("inner", "other")
      .select(struct(col("inner")).as("outer"), col("other"))
    val r = df.select(Partitioners.fieldPartition(
      "outer.inner" -> col("outer.inner")).as("e"))
      .orderBy("e").as[String].collect()
    assert(r.toSeq == Seq("outer.inner=16", "outer.inner=17"))
  }

  test("W4 ByteArray format writes raw lines with .bin extension " +
    "(ByteArrayRecordWriterProvider.java:38-92)") {
    val out = freshDir()
    val df = (0L until 3L).map(o => (0, o, s"payload-$o"))
      .toDF("kafka_partition", "offset", "value")
    val cfg = IngestConfig(topic = "raw", format = OutputFormat.ByteArray)
    val files = IngestWriter.write(df, cfg,
      Partitioners.defaultPartition(col("kafka_partition")), out,
      col("kafka_partition"), col("offset"), payloadCols = Seq(col("value")))
    assert(files.map(_.fileName) == Seq("raw+0+0000000000.bin"))
    val lines = scala.io.Source.fromFile(files.head.path).getLines().toSeq
    assert(lines.sorted == Seq("payload-0", "payload-1", "payload-2"))
  }

  test("hourly PartitionerSpec compiles to the reference path format") {
    val df = Seq((0, 0L, "2024-03-01 13:00:00"))
      .toDF("kafka_partition", "offset", "ts")
    val e = PartitionerSpec.compile(
      PartitionerSpec.SchemaAffix(PartitionerSpec.Hourly("ts"), "s1"),
      col("kafka_partition"))
    assert(df.select(e).head.getString(0) ==
      "schema_name=s1/year=2024/month=03/day=01/hour=13")
  }
}
