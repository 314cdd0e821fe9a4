package graft.streaming

import graft.SparkSuite
import graft.ingest.{Dlq, IngestConfig, PartitionerSpec, RecordViews, Ingest}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Schema contract against the REAL Kafka source: `spark-sql-kafka`'s
  * output schema is fixed and documented — `key binary, value binary,
  * topic string, partition int, offset long, timestamp timestamp,
  * timestampType int` (Spark Structured Streaming Kafka guide). No Kafka
  * jar ships in this environment (zero-egress; documented as a permanent
  * env limit in COVERAGE.md), so these tests pin the next-best thing:
  * the ENTIRE pipeline — deserialization, DLQ routing, null behavior,
  * partitioning, rotation, layout — consumes a frame of EXACTLY that
  * schema with no renames or casts outside the pipeline's own config,
  * proving `readStream.format("kafka")` is genuinely a one-line swap.
  */
class KafkaContractSpec extends SparkSuite {
  import spark.implicits._

  /** The verbatim spark-sql-kafka source schema. */
  private val kafkaSchema = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  private def kafkaFrame(rows: Seq[(Array[Byte], Array[Byte], String, Int,
      Long, java.sql.Timestamp, Int)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3, r._4, r._5, r._6, r._7))),
      kafkaSchema)

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("the batch pipeline consumes the verbatim 7-tuple: binary value " +
    "deserialization -> DLQ -> tombstone-aware field partitioning -> " +
    "reference layout, with no pre-pipeline reshaping") {
    val out = Files.createTempDirectory("kafka_contract").toString
    val base = 1704067200000L
    val rows = (0L until 12L).map { o =>
      val json = if (o == 7L) "{broken" // malformed → DLQ
        else s"""{"event_type":"t${o % 2}","v":$o}"""
      (s"k$o".getBytes("UTF-8"),
        if (o == 5L) null else json.getBytes("UTF-8"), // offset 5: tombstone
        "events", (o % 2).toInt, o, ts(base + o * 1000), 0)
    }
    val frame = kafkaFrame(rows)
    assert(frame.schema == kafkaSchema)

    // deserialization happens INSIDE the pipeline surface: value bytes →
    // string → parsed struct; the DLQ check runs on the raw value
    val decoded = frame
      .withColumn("json", col("value").cast("string"))
      .withColumn("parsed",
        from_json(col("json"),
          StructType.fromDDL("event_type STRING, v LONG")))
    val routed = Dlq.route(decoded, Seq(
      "malformed_json" -> Dlq.malformedJson(col("json"))))
    assert(routed.deadLetter.count() == 1 &&
      routed.deadLetter.head.getAs[Long]("offset") == 7L)

    val cfg = IngestConfig(topic = "events", flushSize = 100,
      nullBehavior = RecordViews.IgnoreNulls)
    val r = Ingest.run(routed.ok, cfg,
      PartitionerSpec.TombstoneAware(
        PartitionerSpec.Custom(graft.ingest.Partitioners.fieldPartition(
          "etype" -> col("parsed.event_type"))), "value"),
      out,
      kafkaPartition = col("partition"), offset = col("offset"),
      payloadCols = Seq(col("offset"), col("parsed.v").as("v")),
      valueColumnForNulls = Some("value"))
    // IgnoreNulls drops the tombstone BEFORE partitioning; the DLQ row is
    // already routed out: 12 - 1 dlq - 1 tombstone = 10 records
    val back = spark.read.parquet(s"$out/topics/events/*")
    assert(back.count() == 10)
    assert(r.reportedNulls.exists(_.count() == 1),
      "the dropped tombstone must surface for DLQ reporting")
    val dirs = new java.io.File(s"$out/topics/events")
      .listFiles().map(_.getName).sorted.toSeq
    assert(dirs == Seq("etype=t0", "etype=t1"))
  }

  test("the STREAMING pipeline consumes the verbatim 7-tuple via " +
    "foreachBatch with kafka-named columns end to end") {
    val src = Files.createTempDirectory("kc_src").toString
    val out = Files.createTempDirectory("kc_out").toString
    val ckpt = Files.createTempDirectory("kc_ckpt").toString
    val base = 1704067200000L
    kafkaFrame((0L until 8L).map { o =>
      (s"k$o".getBytes("UTF-8"),
        s"""{"event_type":"t${o % 2}"}""".getBytes("UTF-8"),
        "events", 0, o, ts(base + o * 1000), 0)
    }).coalesce(1).write.mode("overwrite").parquet(src)

    val stream = spark.readStream.schema(kafkaSchema).parquet(src)
      .withColumn("parsed",
        from_json(col("value").cast("string"),
          StructType.fromDDL("event_type STRING")))
    val q = StreamingIngest.startPipeline(stream,
      IngestConfig(topic = "events", flushSize = 100),
      PartitionerSpec.Fields(Seq("parsed.event_type")), out, ckpt,
      kafkaPartition = col("partition"), offset = col("offset"),
      payloadCols = Seq(col("offset"), col("timestamp")))
    q.awaitTermination(60000)
    val back = spark.read
      .parquet(s"$out/topics/events/parsed.event_type=t0/events+0+0000000000.parquet")
    assert(back.count() == 4)
  }

  test("the STREAMING pipeline consumes the verbatim headers-bearing " +
    "schema (includeHeaders=true adds headers array<struct<key string, " +
    "value binary>>) through P3/P4: binary header values stringify " +
    "(RecordViews.java:106-110) and .keys/.headers sidecars stay in " +
    "lockstep with the value files") {
    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val src = Files.createTempDirectory("kch_src").toString
    val out = Files.createTempDirectory("kch_out").toString
    val ckpt = Files.createTempDirectory("kch_ckpt").toString
    val base = 1704067200000L
    // the verbatim spark-sql-kafka schema WITH the optional headers
    // column the source adds under includeHeaders=true
    val withHeaders = kafkaSchema.add(StructField("headers",
      ArrayType(StructType(Seq(
        StructField("key", StringType),
        StructField("value", BinaryType))))))
    val rows = (0L until 6L).map { o =>
      org.apache.spark.sql.Row(
        s"k$o".getBytes("UTF-8"),
        s"""{"event_type":"t${o % 2}"}""".getBytes("UTF-8"),
        "events", 0, o, ts(base + o * 1000), 0,
        Seq(
          org.apache.spark.sql.Row("trace", s"tr-$o".getBytes("UTF-8")),
          org.apache.spark.sql.Row("src", "crawler".getBytes("UTF-8"))))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows),
      withHeaders).coalesce(1).write.mode("overwrite").parquet(src)

    val stream = spark.readStream.schema(withHeaders).parquet(src)
      .withColumn("key", col("key").cast("string"))
      .withColumn("parsed",
        from_json(col("value").cast("string"),
          StructType.fromDDL("event_type STRING")))
    val q = StreamingIngest.startPipeline(stream,
      IngestConfig(topic = "events", flushSize = 100,
        writeKeys = true, writeHeaders = true),
      PartitionerSpec.Fields(Seq("parsed.event_type")), out, ckpt,
      kafkaPartition = col("partition"), offset = col("offset"),
      payloadCols = Seq(col("offset")))
    q.awaitTermination(60000)

    val dir = s"$out/topics/events/parsed.event_type=t0"
    val names = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(n => n.startsWith(".") || n.endsWith(".crc")).sorted.toSeq
    assert(names == Seq("events+0+0000000000.headers.avro",
      "events+0+0000000000.keys.avro", "events+0+0000000000.parquet"),
      s"lockstep sidecar layout broken: $names")

    // decode the headers sidecar: every binary value landed as its UTF-8
    // string (the P3 stringification), one array per record in offset
    // order (t0 records are offsets 0, 2, 4)
    val reader = new DataFileReader[GenericRecord](
      new java.io.File(s"$dir/events+0+0000000000.headers.avro"),
      new GenericDatumReader[GenericRecord]())
    val decoded = scala.collection.mutable.ArrayBuffer.empty[Seq[(String, String)]]
    while (reader.hasNext) {
      val hs = reader.next().get("headers")
        .asInstanceOf[java.util.List[_]]
      decoded += (0 until hs.size()).map { i =>
        val h = hs.get(i).asInstanceOf[GenericRecord]
        (h.get("key").toString, h.get("value").toString)
      }
    }
    reader.close()
    assert(decoded.toSeq == Seq(0L, 2L, 4L).map(o =>
      Seq(("trace", s"tr-$o"), ("src", "crawler"))),
      s"stringified header mismatch: $decoded")
  }

  test("MULTI-TOPIC subscription over the verbatim 7-tuple: the source's " +
    "own topic column routes each record to its topic's subtree with " +
    "its topic's config — the reference's topics list, one line on the " +
    "real Kafka source") {
    val src = Files.createTempDirectory("kcm_src").toString
    val out = Files.createTempDirectory("kcm_out").toString
    val ckpt = Files.createTempDirectory("kcm_ckpt").toString
    val base = 1704067200000L
    // two topics interleaved in one subscription (offsets unique within
    // each (topic, partition) because they are globally unique here)
    kafkaFrame((0L until 12L).map { o =>
      (s"k$o".getBytes("UTF-8"),
        s"""{"event_type":"t${o % 2}"}""".getBytes("UTF-8"),
        if (o % 3 == 0) "orders" else "clicks", 0, o,
        ts(base + o * 1000), 0)
    }).coalesce(1).write.mode("overwrite").parquet(src)

    val stream = spark.readStream.schema(kafkaSchema).parquet(src)
      .withColumn("parsed",
        from_json(col("value").cast("string"),
          StructType.fromDDL("event_type STRING")))
    val cfgFor = Map(
      "orders" -> IngestConfig(topic = "orders", flushSize = 2),
      "clicks" -> IngestConfig(topic = "clicks", flushSize = 100))
    val q = StreamingIngest.startPipelineMulti(stream, col("topic"),
      cfgFor, PartitionerSpec.Fields(Seq("parsed.event_type")), out, ckpt,
      kafkaPartition = col("partition"), offset = col("offset"),
      payloadCols = Seq(col("offset"), col("timestamp")))
    q.awaitTermination(60000)

    val orders = spark.read.parquet(s"$out/topics/orders/*")
    val clicks = spark.read.parquet(s"$out/topics/clicks/*")
    assert(orders.count() == 4 && clicks.count() == 8,
      s"routing lost records: ${orders.count()}/${clicks.count()}")
    // no cross-contamination: subtree names are the only topics present
    val topics = new java.io.File(s"$out/topics")
      .listFiles().map(_.getName).sorted.toSeq
    assert(topics == Seq("clicks", "orders"), topics)
  }

  test("REGISTRY WIRE-FORMAT over the verbatim 7-tuple: one batch mixing " +
    "two schema ids plus poison frames — per-id decode, BACKWARD R5 " +
    "rotation into per-schema K8 subtrees, DLQ exactly-once") {
    import graft.ingest.{SchemaCompat, WireFormat}
    val src = Files.createTempDirectory("kcw_src").toString
    val out = Files.createTempDirectory("kcw_out").toString
    val ckpt = Files.createTempDirectory("kcw_ckpt").toString
    val dlq = Files.createTempDirectory("kcw_dlq").toString
    val registry = Files.createTempDirectory("kcw_reg").toString
    val base = 1704067200000L

    // frame payloads through the engine's own encoder (bytes pinned
    // against hand-built frames in WireFormatSpec): ids 1 and 2 mixed
    // in ONE batch, v2 carrying the extra column
    val v1 = Seq((0L, "t0"), (2L, "t0"), (4L, "t1"))
      .toDF("v", "event_type")
    val v2 = Seq((1L, "t1", 100L), (3L, "t0", 300L))
      .toDF("v", "event_type", "extra")
    val enc = WireFormat.encode(v1, Seq("v", "event_type"), 1, registry,
        Seq("v"))
      .unionByName(WireFormat.encode(v2, Seq("v", "event_type", "extra"),
        2, registry, Seq("v")))
    val frames = enc.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1))
      .toMap
    val poisonMagic = { val b = frames(0L).clone(); b(0) = 1; b }
    val rows = frames.toSeq.sortBy(_._1).map { case (o, bytes) =>
      (s"k$o".getBytes("UTF-8"),
        if (o == 0L) poisonMagic else bytes, // offset 0 → bad magic
        "events", 0, o, ts(base + o * 1000), 0)
    } :+ (("k9".getBytes("UTF-8"), null: Array[Byte], "events", 0, 9L,
      ts(base + 9000), 0)) // offset 9 → tombstone frame
    kafkaFrame(rows).coalesce(1).write.mode("overwrite").parquet(src)

    val stream = spark.readStream.schema(kafkaSchema).parquet(src)
    val q = StreamingIngest.startWireFormatPipeline(stream,
      IngestConfig(topic = "events", flushSize = 100),
      PartitionerSpec.Fields(Seq("event_type")), out, ckpt, registry,
      SchemaCompat.Backward,
      kafkaPartition = col("partition"), offset = col("offset"),
      keep = Seq("partition", "offset"), dlqDir = Some(dlq))
    q.awaitTermination(60000)

    // BACKWARD + arrival order v1→v2: v2 ROTATES in — two K8 subtrees
    val subtrees = new java.io.File(s"$out/topics/events")
      .listFiles().map(_.getName).sorted.toSeq
    assert(subtrees == Seq("schema_name=record_v1", "schema_name=record_v2"),
      subtrees)
    val g1 = spark.read.parquet(s"$out/topics/events/schema_name=record_v1/*")
    val g2 = spark.read.parquet(s"$out/topics/events/schema_name=record_v2/*")
    // decode-and-compare: offset 0 went to the DLQ, so v1 keeps 2 rows
    assert(g1.select("v").as[Long].collect().sorted.toSeq == Seq(2L, 4L))
    assert(g2.select("v", "extra").as[(Long, Long)].collect().sorted.toSeq ==
      Seq((1L, 100L), (3L, 300L)))
    assert(!g1.columns.contains("extra") && g2.columns.contains("extra"))
    // DLQ: exactly the poison frames, under a deterministic batch dir
    val dl = spark.read.parquet(s"$dlq/batch=0")
    assert(dl.select("offset", "dlq_reason").as[(Long, String)].collect()
      .toSet == Set((0L, "bad_magic"), (9L, "null_value")))
  }

  test("HOT schema registration: a schema id registered AFTER the first " +
    "wire-format run is picked up on the next (registry reload per " +
    "batch) — frames that arrived under the unknown id DLQ'd, later " +
    "frames under it decode, no pipeline rebuild") {
    import graft.ingest.{SchemaCompat, WireFormat}
    val src = Files.createTempDirectory("kchot_src").toString
    val out = Files.createTempDirectory("kchot_out").toString
    val ckpt = Files.createTempDirectory("kchot_ckpt").toString
    val dlq = Files.createTempDirectory("kchot_dlq").toString
    val registry = Files.createTempDirectory("kchot_reg").toString
    val base = 1704067200000L

    def frames(df: org.apache.spark.sql.DataFrame, cols: Seq[String],
               id: Int): Map[Long, Array[Byte]] =
      WireFormat.encode(df, cols, id, registry, Seq("v"))
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap

    def runOnce(rows: Seq[(Long, Array[Byte])]): Unit = {
      kafkaFrame(rows.map { case (o, b) =>
        (s"k$o".getBytes("UTF-8"), b, "events", 0, o,
          ts(base + o * 1000), 0)
      }).coalesce(1).write.mode("append").parquet(src)
      val q = StreamingIngest.startWireFormatPipeline(
        spark.readStream.schema(kafkaSchema).parquet(src),
        IngestConfig(topic = "events", flushSize = 100),
        PartitionerSpec.Fields(Seq("event_type")), out, ckpt, registry,
        SchemaCompat.Backward,
        kafkaPartition = col("partition"), offset = col("offset"),
        keep = Seq("partition", "offset"), dlqDir = Some(dlq))
      q.awaitTermination(60000)
    }

    // phase 1: only id 1 registered; offsets 0-1 under id 1; offset 2
    // arrives framed under the NOT-YET-registered id 2 (produced to a
    // scratch registry so only the frame bytes exist here)
    val scratch = Files.createTempDirectory("kchot_scratch").toString
    val v1frames = frames(Seq((0L, "t0"), (1L, "t1")).toDF("v", "event_type"),
      Seq("v", "event_type"), 1)
    val early2 = WireFormat.encode(
      Seq((2L, "t0", 20L)).toDF("v", "event_type", "extra"),
      Seq("v", "event_type", "extra"), 2, scratch, Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    runOnce(Seq(0L -> v1frames(0L), 1L -> v1frames(1L), 2L -> early2(2L)))
    val dl1 = spark.read.parquet(s"$dlq/batch=0")
    assert(dl1.select("offset", "dlq_reason").as[(Long, String)].collect()
      .toSet == Set((2L, "unknown_schema_id")), "early id-2 frame must DLQ")

    // phase 2: register id 2 (same bytes contract as the scratch copy),
    // new frames under both ids — the SAME checkpoint continues, the new
    // id decodes, no restartd pipeline object is reused
    val v2frames = frames(
      Seq((3L, "t1", 30L)).toDF("v", "event_type", "extra"),
      Seq("v", "event_type", "extra"), 2)
    val lateV1 = frames(Seq((4L, "t0")).toDF("v", "event_type"),
      Seq("v", "event_type"), 1)
    runOnce(Seq(3L -> v2frames(3L), 4L -> lateV1(4L)))

    val g1 = spark.read.parquet(s"$out/topics/events/schema_name=record_v1/*")
    val g2 = spark.read.parquet(s"$out/topics/events/schema_name=record_v2/*")
    assert(g1.select("v").as[Long].collect().sorted.toSeq ==
      Seq(0L, 1L, 4L), "v1 frames across both batches must land")
    assert(g2.select("v", "extra").as[(Long, Long)].collect().toSeq ==
      Seq((3L, 30L)), "the hot-registered id must decode post-registration")
  }
  test("kafkaSource is wired to the real kafka data source: the builder " +
    "executes the full option chain and fails exactly at the missing-jar " +
    "boundary (zero-egress env ships no spark-sql-kafka)") {
    val err = intercept[Exception] {
      StreamingIngest.kafkaSource(spark,
        bootstrapServers = "broker:9092", subscribe = "events",
        maxOffsetsPerTrigger = Some(100000L))
    }
    // Spark's standard missing-data-source error names the format — the
    // wiring is real, only the jar is absent; with spark-sql-kafka on
    // the classpath the same call returns the verbatim 7-tuple stream
    val msg = (err.getMessage + " " + err.getClass.getName).toLowerCase
    assert(msg.contains("kafka"), msg)
  }
}
