package graft.tools

import graft.Tables
import graft.ingest._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end demo/driver of the ingest sink pipeline: reads the `events`
  * table as the "topic", writes the reference S3 layout, prints the object
  * keys, then replays the batch to show idempotent deterministic naming (X1).
  *
  * Usage: tools/run.sh graft.tools.IngestDemo [sfDir] [outDir]
  */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse(
      s"/tmp/graft_ingest_demo_${System.currentTimeMillis}")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val frame = Tables.load(spark, sfDir, "events")
      .withColumn("kafka_partition", pmod(col("user_id"), lit(4)))
      .withColumnRenamed("event_id", "offset")

    val cfg = IngestConfig(topic = "events", flushSize = 500,
      compression = Some("snappy"))
    val epart = Partitioners.fieldPartition("event_type" -> col("event_type"))

    def writeOnce(): Seq[IngestWriter.FileInfo] =
      IngestWriter.write(frame, cfg, epart, outDir,
        kafkaPartition = col("kafka_partition"), offset = col("offset"),
        payloadCols = Seq(col("offset"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props")))

    val files = writeOnce()
    println(s"== wrote ${files.length} objects under $outDir")
    files.take(12).foreach(f => println(s"   ${f.path}"))

    // X1: replay the identical batch — names must be identical (idempotent).
    val replay = writeOnce()
    require(files.map(_.path) == replay.map(_.path),
      "replay produced different object keys — X1 broken")
    println("== replay produced byte-identical object keys (X1 ok)")

    // read back through the Hive-style layout and count per partition dir
    // (partition discovery on the directory — a trailing glob works too but
    // logs a noisy recovered FileNotFoundException inside DataFrameReader)
    val back = spark.read.parquet(s"$outDir/topics/events")
    println(s"== read back ${back.count()} records (input ${frame.count()})")

    // hourly time-partitioned JSON+gzip variant exercises nested dirs + W5
    val cfgJson = IngestConfig(topic = "events_json",
      format = OutputFormat.Json, flushSize = 2000, compression = Some("gzip"))
    val hourly = Partitioners.hourlyPartition(col("ts"))
    val jfiles = IngestWriter.write(frame, cfgJson, hourly, outDir,
      kafkaPartition = col("kafka_partition"), offset = col("offset"),
      payloadCols = Seq(col("offset"), col("event_type"), col("value")))
    println(s"== json+gzip hourly: ${jfiles.length} objects")
    jfiles.take(4).foreach(f => println(s"   ${f.path}"))

    // W1 Avro container files (direct path, no spark-avro module needed)
    val cfgAvro = IngestConfig(topic = "events_avro",
      format = OutputFormat.Avro, flushSize = 500,
      compression = Some("deflate"))
    val afiles = IngestWriter.write(frame, cfgAvro, epart, outDir,
      kafkaPartition = col("kafka_partition"), offset = col("offset"),
      payloadCols = Seq(col("offset"), col("ts"), col("event_type"),
        col("value")))
    println(s"== avro+deflate: ${afiles.length} objects")
    afiles.take(4).foreach(f => println(s"   ${f.path}"))
    val reader = new org.apache.avro.file.DataFileReader[
      org.apache.avro.generic.GenericRecord](
      new java.io.File(afiles.head.path),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    var n = 0
    var first: String = null
    while (reader.hasNext) { val r = reader.next(); if (n == 0) first = r.toString; n += 1 }
    reader.close()
    println(s"== avro decode-back: $n records in ${afiles.head.fileName}; first=$first")

    spark.stop()
  }
}
