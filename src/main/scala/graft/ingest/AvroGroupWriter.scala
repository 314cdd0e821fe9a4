package graft.ingest

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import scala.collection.JavaConverters._

/** W1 Avro object-container writer
  * (reference: format/avro/AvroRecordWriterProvider.java:61-121).
  *
  * The environment ships Avro core but not the spark-avro DataFrameWriter
  * module, so Avro files are written directly: rows are hash-partitioned by
  * file group and sorted by (group, offset), then each task streams its
  * contiguous groups through a DataFileWriter straight to the final object
  * key — no staging rename. Deterministic names make replay idempotent
  * (overwrite=true), same X1 contract as the staged formats.
  */
object AvroGroupWriter {

  def sparkToAvro(dt: DataType, name: String): Schema = dt match {
    case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case TimestampType | TimestampNTZType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    // Avro decimal logical type: unscaled big-endian bytes + the
    // precision/scale carried in the schema (the reference's Connect
    // Decimal mapping, format/parquet/ParquetRecordWriterProvider.java:150)
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case ArrayType(et, _) => Schema.createArray(nullable(sparkToAvro(et, name + "_item")))
    // Avro maps are string-keyed (SURVEY §1.2 MAP)
    case MapType(StringType, vt, _) =>
      Schema.createMap(nullable(sparkToAvro(vt, name + "_value")))
    case MapType(kt, _, _) => throw new IllegalArgumentException(
      s"Avro maps require string keys, got $kt")
    case st: StructType => structToAvro(st, name)
    case other => throw new IllegalArgumentException(s"unsupported Avro type: $other")
  }

  private def nullable(s: Schema): Schema =
    Schema.createUnion(java.util.Arrays.asList(Schema.create(Schema.Type.NULL), s))

  /** Field-level Avro schema. A `StringType` field whose metadata carries
    * `avro.enum.symbols` (comma-separated) becomes an Avro ENUM — the
    * Connect-enum analogue (DataWriterAvroTest.java:157-189); Spark has no
    * enum type, so the hint rides in column metadata. Every field is a
    * `[null, T]` union (Connect optional semantics); wider mixed-type
    * unions have no Spark-type equivalent and are rejected upstream as
    * unsupported types — the documented divergence. */
  private def fieldSchema(f: StructField, name: String): Schema =
    if (f.dataType == StringType && f.metadata.contains("avro.enum.symbols")) {
      val symbols = f.metadata.getString("avro.enum.symbols")
        .split(",").map(_.trim).toList
      val ename =
        if (f.metadata.contains("avro.enum.name"))
          f.metadata.getString("avro.enum.name")
        else s"${name}_${f.name}_enum"
      Schema.createEnum(ename, null, "graft.ingest", symbols.asJava)
    } else sparkToAvro(f.dataType, name + "_" + f.name)

  def structToAvro(st: StructType, name: String): Schema = {
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, nullable(fieldSchema(f, name)),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, "graft.ingest", false, fields.toList.asJava)
  }

  private def toAvroValue(v: Any, dt: DataType, schema: Schema): Any = (v, dt) match {
    case (null, _) => null
    case (x: Byte, _) => x.toInt
    case (x: Short, _) => x.toInt
    case (x: java.sql.Timestamp, _) =>
      x.getTime * 1000L + (x.getNanos / 1000) % 1000
    case (x: java.time.Instant, _) =>
      x.getEpochSecond * 1000000L + x.getNano / 1000
    case (x: java.time.LocalDateTime, _) =>
      x.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
        x.getNano / 1000
    case (x: java.math.BigDecimal, d: DecimalType) =>
      // decimal logical type: unscaled big-endian bytes at the declared scale
      java.nio.ByteBuffer.wrap(
        x.setScale(d.scale).unscaledValue().toByteArray)
    case (x: Array[Byte], _) => java.nio.ByteBuffer.wrap(x)
    case (x: String, StringType)
      if resolveNonNull(schema).getType == Schema.Type.ENUM =>
      new GenericData.EnumSymbol(resolveNonNull(schema), x)
    case (x: Row, st: StructType) =>
      rowToRecord(x, st, resolveNonNull(schema))
    case (x: scala.collection.Seq[_], ArrayType(et, _)) =>
      val elemSchema = resolveNonNull(schema).getElementType
      x.map(e => toAvroValue(e, et, elemSchema)).asJava
    case (x: scala.collection.Map[_, _], MapType(_, vt, _)) =>
      val valueSchema = resolveNonNull(schema).getValueType
      val m = new java.util.LinkedHashMap[String, Any]
      x.foreach { case (k, v) => m.put(k.toString, toAvroValue(v, vt, valueSchema)) }
      m
    case (x, _) => x
  }

  private def resolveNonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  def rowToRecord(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < st.fields.length) {
      val f = st.fields(i)
      val fieldSchema = schema.getField(f.name).schema()
      rec.put(f.name,
        if (row.isNullAt(i)) null
        else toAvroValue(row.get(i), f.dataType, fieldSchema))
      i += 1
    }
    rec
  }

  /** Write `df` (carrying `epartCol`/`fnameCol` group columns) as one Avro
    * container file per (encodedPartition, fileName), rows in `orderCol`
    * order, directly at `<topicDir>/<epart>/<fname>`. Returns the manifest. */
  def write(df: DataFrame, epartCol: String, fnameCol: String,
            orderCol: String, payload: StructType, topicDir: String,
            codec: Option[String]): Seq[IngestWriter.FileInfo] = {
    val avroSchemaJson = structToAvro(payload, "record").toString
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val payloadFields = payload.fieldNames.toSeq
    val codecName = codec.getOrElse("null")

    import org.apache.spark.sql.functions.col
    val arranged = df
      .repartition(col(epartCol), col(fnameCol))
      .sortWithinPartitions(col(epartCol), col(fnameCol), col(orderCol))

    val infos = arranged.toDF().rdd.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(avroSchemaJson)
      val fs = FileSystem.get(new java.net.URI(topicDir),
        hadoopConf.value)
      var currentKey: (String, String) = null
      var writer: DataFileWriter[GenericRecord] = null
      val out = scala.collection.mutable.ArrayBuffer.empty[IngestWriter.FileInfo]
      def close(): Unit = if (writer != null) { writer.close(); writer = null }
      val result = rows.flatMap { row =>
        val epart = row.getAs[String](epartCol)
        val fname = row.getAs[String](fnameCol)
        if ((epart, fname) != currentKey) {
          close()
          currentKey = (epart, fname)
          val dest = new Path(s"$topicDir/$epart/$fname")
          fs.mkdirs(dest.getParent)
          writer = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](schema))
          codecName match {
            case "null" | "none" => ()
            case "deflate" => writer.setCodec(CodecFactory.deflateCodec(6))
            case c => writer.setCodec(CodecFactory.fromString(c))
          }
          writer.create(schema, fs.create(dest, true))
          out += IngestWriter.FileInfo(epart, fname, dest.toString)
        }
        val payloadRow = Row.fromSeq(payloadFields.map(f => row.getAs[Any](f)))
        writer.append(rowToRecord(payloadRow, payload, schema))
        Iterator.empty[IngestWriter.FileInfo]
      } ++ {
        close()
        out.iterator
      }
      result
    }.collect().toSeq

    infos.sortBy(f => (f.encodedPartition, f.fileName))
  }
}
