package graft.ingest

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Golden object-key assertions in the reference style
  * (TopicPartitionWriterTest.java:287-292) plus read-back equality. */
class IngestWriterSpec extends SparkSuite {
  import spark.implicits._

  private def freshDir() =
    Files.createTempDirectory("ingest_spec").toString

  private def frame() =
    (0L until 9L).map(o => (0, o, s"v$o", (o % 3).toInt))
      .toDF("kafka_partition", "offset", "payload", "bucket")

  test("W13/X1 default-partitioner layout with flush.size=3 → exact keys " +
    "topics/t/partition=0/t+0+000000000{0,3,6}.parquet") {
    val out = freshDir()
    val cfg = IngestConfig(topic = "t", flushSize = 3)
    val files = IngestWriter.write(frame(), cfg,
      Partitioners.defaultPartition(col("kafka_partition")), out,
      col("kafka_partition"), col("offset"),
      payloadCols = Seq(col("offset"), col("payload")))
    val rel = files.map(f => f.encodedPartition + "/" + f.fileName)
    assert(rel == Seq(
      "partition=0/t+0+0000000000.parquet",
      "partition=0/t+0+0000000003.parquet",
      "partition=0/t+0+0000000006.parquet"))
    // read-back: content equality in offset order
    val back = spark.read.parquet(s"$out/topics/t/*")
      .orderBy("offset").as[(Long, String)].collect()
    assert(back.toSeq == (0L until 9L).map(o => (o, s"v$o")))
  }

  test("pad width is configurable (reference test uses width 2)") {
    val out = freshDir()
    val cfg = IngestConfig(topic = "t", flushSize = 100, padWidth = 2)
    val files = IngestWriter.write(frame(), cfg,
      Partitioners.defaultPartition(col("kafka_partition")), out,
      col("kafka_partition"), col("offset"),
      payloadCols = Seq(col("offset")))
    assert(files.map(_.fileName) == Seq("t+0+00.parquet"))
  }

  test("multi-value field partition fans out per encoded partition with " +
    "per-partition start offsets") {
    val out = freshDir()
    val cfg = IngestConfig(topic = "ev", flushSize = 100)
    val files = IngestWriter.write(frame(), cfg,
      Partitioners.fieldPartition("bucket" -> col("bucket")), out,
      col("kafka_partition"), col("offset"),
      payloadCols = Seq(col("offset"), col("bucket")))
    val rel = files.map(f => f.encodedPartition + "/" + f.fileName)
    assert(rel == Seq(
      "bucket=0/ev+0+0000000000.parquet",
      "bucket=1/ev+0+0000000001.parquet",
      "bucket=2/ev+0+0000000002.parquet"))
  }

  test("X1 replay writes byte-identical keys (idempotent overwrite)") {
    val out = freshDir()
    val cfg = IngestConfig(topic = "t", flushSize = 4)
    def go() = IngestWriter.write(frame(), cfg,
      Partitioners.defaultPartition(col("kafka_partition")), out,
      col("kafka_partition"), col("offset"), payloadCols = Seq(col("offset")))
    assert(go().map(_.path) == go().map(_.path))
  }

  test("P4 K/V/H lockstep: .keys and .headers files share the basename " +
    "(Utils.java:31-40 contract)") {
    val out = freshDir()
    val df = (0L until 4L)
      .map(o => (0, o, s"k$o", s"v$o",
        Seq((s"h$o", s"hv$o"))))
      .toDF("kafka_partition", "offset", "key", "value", "headers")
    val cfg = IngestConfig(topic = "t", flushSize = 10,
      writeKeys = true, writeHeaders = true)
    val files = IngestWriter.writeKVH(df, cfg,
      Partitioners.defaultPartition(col("kafka_partition")), out,
      col("kafka_partition"), col("offset"),
      valueCols = Seq(col("offset"), col("value")))
    assert(files.map(_.fileName).sorted == Seq(
      "t+0+0000000000.headers.parquet",
      "t+0+0000000000.keys.parquet",
      "t+0+0000000000.parquet"))
    val keys = spark.read.parquet(s"$out/topics/t/partition=0/t+0+0000000000.keys.parquet")
    assert(keys.columns.toSeq == Seq("RecordKey"))
  }

  test("F2 fail-on-null keys raises when keys are stored") {
    val out = freshDir()
    val df = Seq((0, 0L, null.asInstanceOf[String], "v"))
      .toDF("kafka_partition", "offset", "key", "value")
    val cfg = IngestConfig(topic = "t", writeKeys = true)
    val e = intercept[Exception] {
      IngestWriter.writeKVH(df, cfg,
        Partitioners.defaultPartition(col("kafka_partition")), out,
        col("kafka_partition"), col("offset"), valueCols = Seq(col("value")))
    }
    assert(e.getMessage != null)
  }

  test("written Hive-style layout partition-prunes on read back " +
    "(the property that makes the lake queryable at 100 TB)") {
    val out = freshDir()
    val cfg = IngestConfig(topic = "pp", flushSize = 100)
    IngestWriter.write(frame(), cfg,
      Partitioners.fieldPartition("bucket" -> col("bucket")), out,
      col("kafka_partition"), col("offset"),
      payloadCols = Seq(col("offset"), col("payload")))
    val back = spark.read.parquet(s"$out/topics/pp")
      .filter(col("bucket") === 1)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("bucket"), plan)
    assert(back.count() == 3) // offsets 1,4,7
  }

  test("W1 Avro container files: contract names, codec, decode-and-compare " +
    "(AvroRecordWriterProvider.java:61-121)") {
    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val out = freshDir()
    val cfg = IngestConfig(topic = "t", format = OutputFormat.Avro,
      flushSize = 4, compression = Some("deflate"))
    val files = IngestWriter.write(frame(), cfg,
      Partitioners.defaultPartition(col("kafka_partition")), out,
      col("kafka_partition"), col("offset"),
      payloadCols = Seq(col("offset"), col("payload")))
    assert(files.map(_.fileName) == Seq(
      "t+0+0000000000.avro", "t+0+0000000004.avro", "t+0+0000000008.avro"))
    val reader = new DataFileReader[GenericRecord](
      new java.io.File(files.head.path),
      new GenericDatumReader[GenericRecord]())
    val recs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    while (reader.hasNext) {
      val r = reader.next()
      recs += ((r.get("offset").asInstanceOf[Long], r.get("payload").toString))
    }
    reader.close()
    assert(recs.toSeq == (0L until 4L).map(o => (o, s"v$o")))
  }

  test("W1 Avro replay is idempotent (direct-path overwrite)") {
    val out = freshDir()
    val cfg = IngestConfig(topic = "t", format = OutputFormat.Avro, flushSize = 100)
    def go() = IngestWriter.write(frame(), cfg,
      Partitioners.defaultPartition(col("kafka_partition")), out,
      col("kafka_partition"), col("offset"), payloadCols = Seq(col("offset")))
    assert(go().map(_.path) == go().map(_.path))
  }

  test("R2 composition: extra time file-group splits files within a " +
    "partition and names stay offset-deterministic") {
    val out = freshDir()
    val df = Seq(
      (0, 0L, "2024-01-01 00:10:00"), (0, 1L, "2024-01-01 00:20:00"),
      (0, 2L, "2024-01-01 01:10:00"), (0, 3L, "2024-01-01 01:20:00"))
      .toDF("kafka_partition", "offset", "s")
      .withColumn("ts", col("s").cast("timestamp"))
    val cfg = IngestConfig(topic = "t", flushSize = 100)
    val files = IngestWriter.write(df, cfg,
      Partitioners.defaultPartition(col("kafka_partition")), out,
      col("kafka_partition"), col("offset"),
      payloadCols = Seq(col("offset")),
      extraFileGroups = Seq(Rotation.timeFileGroup(col("ts"), 3600000L)))
    assert(files.map(_.fileName) ==
      Seq("t+0+0000000000.parquet", "t+0+0000000002.parquet"))
  }
}
