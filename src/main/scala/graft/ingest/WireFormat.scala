package graft.ingest

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader,
  GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.JavaConverters._

/** Schema-registry wire-format deserialization — the first hop of a real
  * Kafka→lake deployment (SURVEY §1.3a). The reference delegates this to
  * Connect converters OUTSIDE its repo (`S3SinkTask` already sees
  * structured records), so this is the extension that lets a reference
  * user point raw registry-framed bytes at the engine directly.
  *
  * Wire format (the public Confluent framing): 1 magic byte `0x00`,
  * 4-byte big-endian int32 schema id, Avro binary body encoded with the
  * writer schema the id names. The registry here is a plain directory of
  * `<id>.avsc` files (id → writer schema JSON) — the registry lookup is
  * an interface, not a service dependency; a production deployment fills
  * the same directory from its registry's `/schemas/ids/<id>` endpoint.
  *
  * Spark mapping, scale-first:
  *  - header fields parse DECLARATIVELY (`substring`/`hex`/`conv` — all
  *    codegen'd; no UDF touches the corpus until the Avro body decode);
  *  - malformed frames (null value, wrong magic, id absent from the
  *    registry) route through the F4 DLQ split BEFORE any decode work —
  *    a poison frame costs a predicate, not an executor exception;
  *  - the Avro body decode is per-partition imperative by nature (a
  *    stateful `BinaryDecoder` + `GenericDatumReader` reused across the
  *    partition — the justified-`mapPartitions` class, same as image
  *    decode), one pass, no shuffle: Scan → project header → decode;
  *  - per-id frames come back as `SchemaEvolution.VersionedBatch`es
  *    (registry id = schema version, Avro record name = schema name), so
  *    the existing P5 compatibility matrix + R5 rotation
  *    (`SchemaEvolution.resolve`) drive the rotate-or-project decision
  *    with NO new policy code.
  *
  * 100 TB: the decode is map-only and embarrassingly parallel; the only
  * driver-side state is the registry (|ids| files, registry-churn scale)
  * and the distinct-id probe per batch (bounded by registry churn, never
  * row count — the SchemaEvolution.splitByVersion argument). */
object WireFormat {

  /** Write `<id>.avsc` into the registry directory (idempotent — same id
    * re-registered must carry the same schema, mirroring registry
    * immutability). */
  def register(spark: org.apache.spark.sql.SparkSession,
               registryDir: String, id: Int, schemaJson: String): Unit = {
    val dir = new Path(registryDir)
    val fs = FileSystem.get(dir.toUri,
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val p = new Path(dir, s"$id.avsc")
    val canonical = new Schema.Parser().parse(schemaJson).toString
    if (fs.exists(p)) {
      val prior = readFully(fs, p)
      require(new Schema.Parser().parse(prior).toString == canonical,
        s"schema id $id already registered with a different schema")
    } else {
      val out = fs.create(p, true)
      out.write(canonical.getBytes("UTF-8"))
      out.close()
    }
  }

  /** id → writer schema JSON for every `<id>.avsc` in the directory.
    * Driver-side, registry-churn scale. */
  def loadRegistry(spark: org.apache.spark.sql.SparkSession,
                   registryDir: String): Map[Int, String] = {
    val dir = new Path(registryDir)
    val fs = FileSystem.get(dir.toUri,
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return Map.empty
    fs.listStatus(dir).toSeq
      .filter(_.getPath.getName.endsWith(".avsc"))
      .map { st =>
        val id = st.getPath.getName.stripSuffix(".avsc").toInt
        id -> readFully(fs, st.getPath)
      }.toMap
  }

  private def readFully(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, "UTF-8")
    } finally in.close()
  }

  // ---- header (declarative, codegen'd — no UDF) ----

  /** Big-endian int32 schema id from bytes 2-5 of the frame. LONG on
    * purpose: a garbage frame with the high bit set must flow to the
    * DLQ's unknown-id check, not throw in ANSI int cast. */
  def schemaIdCol(value: Column): Column =
    conv(hex(substring(value, 2, 4)), 16, 10).cast("long")

  /** Frame starts with the 0x00 magic byte and is long enough to carry
    * the 5-byte header. */
  def magicOkCol(value: Column): Column =
    length(value) >= 5 && substring(value, 1, 1) === lit(Array[Byte](0))

  /** Avro body: everything after the 5-byte header. */
  def bodyCol(value: Column): Column =
    substring(value, 6, Int.MaxValue)

  /** F4 split for registry-framed frames: null value (tombstone class),
    * bad magic / truncated header, id absent from the registry. Runs
    * BEFORE any decode so poison frames never reach the Avro reader. */
  def route(df: DataFrame, value: Column,
            knownIds: Set[Int]): Dlq.Routed =
    Dlq.route(df, Seq(
      "null_value" -> value.isNull,
      "bad_magic" -> !magicOkCol(value),
      "unknown_schema_id" ->
        !schemaIdCol(value).isin(knownIds.toSeq.map(_.toLong): _*)))

  // ---- Avro schema/value → Spark (the inverse of AvroGroupWriter) ----

  /** Spark type for an Avro schema, mirroring `AvroGroupWriter.sparkToAvro`
    * so encode∘decode is type-identical: timestamp-micros LONG →
    * TimestampType, decimal BYTES → DecimalType(p,s), ENUM → StringType,
    * FIXED → BinaryType, `[null, T]` unions → nullable T. */
  def avroToSpark(s: Schema): DataType = s.getType match {
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG =>
      if (s.getLogicalType != null &&
        s.getLogicalType.getName.startsWith("timestamp-")) TimestampType
      else LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      s.getLogicalType match {
        case d: org.apache.avro.LogicalTypes.Decimal =>
          DecimalType(d.getPrecision, d.getScale)
        case _ => BinaryType
      }
    case Schema.Type.ARRAY =>
      ArrayType(avroToSpark(nonNull(s.getElementType)))
    case Schema.Type.MAP =>
      MapType(StringType, avroToSpark(nonNull(s.getValueType)))
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map(f =>
        StructField(f.name, avroToSpark(nonNull(f.schema())))))
    case Schema.Type.UNION => avroToSpark(nonNull(s))
    case other =>
      throw new IllegalArgumentException(s"unsupported Avro type: $other")
  }

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(
        throw new IllegalArgumentException("all-null union"))
    else s

  /** Avro runtime value → Spark external row value. */
  private def toSparkValue(v: Any, s: Schema): Any = {
    if (v == null) return null
    val sch = nonNull(s)
    sch.getType match {
      case Schema.Type.STRING | Schema.Type.ENUM => v.toString
      case Schema.Type.LONG
        if sch.getLogicalType != null &&
          sch.getLogicalType.getName == "timestamp-micros" =>
        val micros = v.asInstanceOf[Long]
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts
      case Schema.Type.BYTES | Schema.Type.FIXED =>
        val bytes = v match {
          case b: java.nio.ByteBuffer =>
            val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
          case f: GenericData.Fixed => f.bytes()
          case a: Array[Byte] => a
        }
        sch.getLogicalType match {
          case d: org.apache.avro.LogicalTypes.Decimal =>
            new java.math.BigDecimal(
              new java.math.BigInteger(bytes), d.getScale)
          case _ => bytes
        }
      case Schema.Type.RECORD =>
        recordToRow(v.asInstanceOf[GenericRecord], sch)
      case Schema.Type.ARRAY =>
        v.asInstanceOf[java.util.Collection[Any]].asScala.toSeq
          .map(toSparkValue(_, sch.getElementType))
      case Schema.Type.MAP =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map {
          case (k, mv) => k.toString -> toSparkValue(mv, sch.getValueType)
        }.toMap
      case _ => v
    }
  }

  def recordToRow(rec: GenericRecord, schema: Schema): Row =
    Row.fromSeq(schema.getFields.asScala.toSeq.map(f =>
      toSparkValue(rec.get(f.pos()), f.schema())))

  // ---- encode (producer/fixture face) ----

  /** Frame `payloadCols` of every row as wire-format bytes under `id`'s
    * schema (derived from the Spark types via the W1 writer's mapping),
    * keeping `keep` columns alongside a `value` binary column. One
    * map-only pass; the datum writer and output buffer are reused per
    * partition. Registers the derived schema under `id` as a side
    * effect so decode finds it. */
  def encode(df: DataFrame, payloadCols: Seq[String], id: Int,
             registryDir: String, keep: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val payloadStruct = StructType(payloadCols.map(c => df.schema(c)))
    val schemaJson =
      AvroGroupWriter.structToAvro(payloadStruct, "record").toString
    register(spark, registryDir, id, schemaJson)
    val outSchema = StructType(
      keep.map(c => df.schema(c)) :+ StructField("value", BinaryType))
    val keepIdx = keep.map(df.schema.fieldIndex)
    val payIdx = payloadCols.map(df.schema.fieldIndex)
    val rdd = df.rdd.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val baos = new java.io.ByteArrayOutputStream()
      var enc: org.apache.avro.io.BinaryEncoder = null
      rows.map { r =>
        baos.reset()
        baos.write(0)
        baos.write((id >>> 24) & 0xff); baos.write((id >>> 16) & 0xff)
        baos.write((id >>> 8) & 0xff); baos.write(id & 0xff)
        enc = EncoderFactory.get().directBinaryEncoder(baos, enc)
        writer.write(AvroGroupWriter.rowToRecord(
          Row.fromSeq(payIdx.map(r.get)), payloadStruct, schema), enc)
        enc.flush()
        Row.fromSeq(keepIdx.map(r.get) :+ baos.toByteArray)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  // ---- decode ----

  /** The per-record decode-failure marker column: null on success, a
    * constant reason on a body the writer schema cannot read. A corrupt
    * body must be DATA (one more DLQ class), never an executor
    * exception — a single poison frame would otherwise fail the task,
    * its retries, and the job (the reference's error reporter exists
    * for exactly this class). */
  val ErrorCol = "_wf_error"
  val CorruptBodyReason = "corrupt_avro_body"

  /** Decode one schema id's frames: rows whose header names `id` have
    * their Avro body read under the registry's writer schema; output =
    * `keep` columns ++ the decoded record's fields (flattened) ++ the
    * `ErrorCol` marker (null on success; on a corrupt body the decoded
    * fields are null and the marker carries `CorruptBodyReason`). */
  def decodeId(df: DataFrame, value: Column, id: Int,
               writerSchemaJson: String, keep: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val writerSchema = new Schema.Parser().parse(writerSchemaJson)
    val decodedStruct = avroToSpark(writerSchema).asInstanceOf[StructType]
    val src = df.filter(schemaIdCol(value) === id)
      .select(keep.map(col) :+ bodyCol(value).as("_wf_body"): _*)
    val outSchema = StructType(
      keep.map(c => src.schema(c)) ++ decodedStruct.fields :+
        StructField(ErrorCol, StringType))
    val nKeep = keep.length
    val nDecoded = decodedStruct.fields.length
    val rdd = src.rdd.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(writerSchemaJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      var dec: org.apache.avro.io.BinaryDecoder = null
      rows.map { r =>
        val body = r.getAs[Array[Byte]](nKeep)
        val decoded =
          try {
            dec = DecoderFactory.get().binaryDecoder(body, dec)
            // fresh record per row: a reused one could leak prior
            // fields into a partially-decoded corrupt successor
            val rec = reader.read(null, dec)
            recordToRow(rec, schema).toSeq :+ null
          } catch {
            case _: java.io.IOException | _: RuntimeException =>
              Seq.fill[Any](nDecoded)(null) :+ CorruptBodyReason
          }
        Row.fromSeq((0 until nKeep).map(r.get) ++ decoded)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** `versionedBatches` plus the corrupt-body side channel. */
  final case class Decoded(batches: Seq[SchemaEvolution.VersionedBatch],
                           corrupt: DataFrame)

  /** The P5/R5 hand-off: split clean frames by schema id (distinct-id
    * probe — registry-churn scale, never row count), decode each under
    * its writer schema, and wrap as `VersionedBatch`es in id order
    * (registry ids are monotone — id IS the schema version; the Avro
    * record name IS the schema name). Feed straight to
    * `SchemaEvolution.resolve(mode, _)`. Frames whose BODY the writer
    * schema cannot read (valid header, corrupt Avro) surface on
    * `Decoded.corrupt` as `(keep…, schema_id, dlq_reason)` — the F4
    * class the header-level `route()` cannot catch. */
  def decodeAll(df: DataFrame, value: Column, registryDir: String,
                keep: Seq[String]): Decoded = {
    val spark = df.sparkSession
    val registry = loadRegistry(spark, registryDir)
    val ids = df.select(schemaIdCol(value).as("id")).distinct()
      .collect().map(_.getLong(0).toInt).sorted
    val perId = ids.toSeq.map { id =>
      val json = registry.getOrElse(id, throw new IllegalArgumentException(
        s"frame carries schema id $id absent from the registry " +
          s"(route() it to the DLQ first)"))
      val schema = new Schema.Parser().parse(json)
      val decoded = decodeId(df, value, id, json, keep)
      val batch = SchemaEvolution.VersionedBatch(
        SchemaCompat.VersionedSchema(schema.getName, Some(id),
          StructType(keep.map(c => df.schema(c)) ++
            avroToSpark(schema).asInstanceOf[StructType].fields)),
        decoded.filter(col(ErrorCol).isNull).drop(ErrorCol))
      val corrupt = decoded.filter(col(ErrorCol).isNotNull)
        .select(keep.map(col) :+ lit(id).as("schema_id") :+
          col(ErrorCol).as("dlq_reason"): _*)
      (batch, corrupt)
    }
    val corrupt = perId.map(_._2) match {
      case Seq() => spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(keep.map(c => df.schema(c)) ++ Seq(
          StructField("schema_id", IntegerType),
          StructField("dlq_reason", StringType))))
      case cs => cs.reduce(_ unionByName _)
    }
    Decoded(perId.map(_._1), corrupt)
  }

  /** Clean-frames-only face of `decodeAll` (batch oracle path — the
    * fixture plants no corrupt bodies, and the streaming pipeline uses
    * `decodeAll` to route them). */
  def versionedBatches(df: DataFrame, value: Column, registryDir: String,
                       keep: Seq[String])
      : Seq[SchemaEvolution.VersionedBatch] =
    decodeAll(df, value, registryDir, keep).batches
}
