package graft.ingest

import graft.SparkSuite
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Pins the Confluent wire-format contract at the byte level: the header
  * framing itself (magic/id/body offsets) against HAND-built frames — not
  * the engine's own encoder — plus the registry discipline, the DLQ
  * precedence, the Avro→Spark type mapping, and the encode∘decode
  * identity over the full supported type lattice. */
class WireFormatSpec extends SparkSuite {
  import spark.implicits._

  private def handFrame(id: Int, schema: Schema,
                        fill: GenericRecord => Unit): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    fill(rec)
    val baos = new java.io.ByteArrayOutputStream()
    baos.write(0)
    baos.write((id >>> 24) & 0xff); baos.write((id >>> 16) & 0xff)
    baos.write((id >>> 8) & 0xff); baos.write(id & 0xff)
    val enc = EncoderFactory.get().directBinaryEncoder(baos, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    baos.toByteArray
  }

  private val v1Json =
    """{"type":"record","name":"evt","fields":[
      |{"name":"et","type":"string"},{"name":"v","type":"long"}]}"""
      .stripMargin.replace("\n", "")

  test("header parse is byte-exact against hand-built frames: magic, " +
    "big-endian id, body offset — and a high-bit id flows to the DLQ " +
    "instead of throwing under ANSI") {
    val schema = new Schema.Parser().parse(v1Json)
    val good = handFrame(131074, schema, r => { // id 0x00020002
      r.put("et", "a"); r.put("v", 7L)
    })
    assert(good(0) == 0x00 && good(1) == 0x00 && good(2) == 0x02 &&
      good(3) == 0x00 && good(4) == 0x02)
    val highBit = Array[Byte](0, 0xff.toByte, 0xff.toByte, 0xff.toByte,
      0xff.toByte, 1, 2)
    val df = Seq(Tuple1(good), Tuple1(highBit)).toDF("value")
    val parsed = df.select(WireFormat.schemaIdCol(col("value")).as("id"))
      .collect().map(_.getLong(0)).sorted
    assert(parsed.toSeq == Seq(131074L, 4294967295L))
    val routed = WireFormat.route(df, col("value"), Set(131074))
    assert(routed.ok.count() == 1)
    assert(routed.deadLetter.select("dlq_reason").as[String].collect()
      .toSeq == Seq("unknown_schema_id"))
  }

  test("registry: register is idempotent on identical schemas and " +
    "rejects a conflicting re-registration of the same id") {
    val dir = Files.createTempDirectory("wf_reg").toString
    WireFormat.register(spark, dir, 5, v1Json)
    WireFormat.register(spark, dir, 5, v1Json) // idempotent
    assert(WireFormat.loadRegistry(spark, dir).keySet == Set(5))
    val other = v1Json.replace("\"v\"", "\"w\"")
    intercept[IllegalArgumentException] {
      WireFormat.register(spark, dir, 5, other)
    }
  }

  test("DLQ precedence over one mixed batch: null_value beats bad_magic " +
    "beats unknown_schema_id; clean frames pass") {
    val schema = new Schema.Parser().parse(v1Json)
    val clean = handFrame(1, schema, r => { r.put("et", "x"); r.put("v", 1L) })
    val badMagic = { val b = clean.clone(); b(0) = 1; b }
    val unknown = { val b = clean.clone(); b(4) = 9; b }
    val df = Seq(("clean", clean), ("null", null), ("magic", badMagic),
      ("unk", unknown)).toDF("tag", "value")
    val routed = WireFormat.route(df, col("value"), Set(1))
    assert(routed.ok.select("tag").as[String].collect().toSeq == Seq("clean"))
    val dl = routed.deadLetter.select("tag", "dlq_reason").as[(String, String)]
      .collect().toMap
    assert(dl == Map("null" -> "null_value", "magic" -> "bad_magic",
      "unk" -> "unknown_schema_id"))
  }

  test("encode -> decodeId is the identity over the full type lattice: " +
    "long, int, double, boolean, string, binary, timestamp-micros, " +
    "decimal, array, string-keyed map, nested struct") {
    val dir = Files.createTempDirectory("wf_rt").toString
    val ts = java.sql.Timestamp.valueOf("2024-03-01 10:20:30.123456")
    val rows = Seq(
      Row(1L, 7, 2.5d, true, "hello", Array[Byte](1, 2),
        ts, new java.math.BigDecimal("12345.67"),
        Seq(1L, 2L, 3L), Map("a" -> 1L), Row("in", 9L)),
      Row(2L, null, null, null, null, null, null, null, null, null, null))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("b", BooleanType),
      StructField("s", StringType), StructField("bin", BinaryType),
      StructField("t", TimestampType),
      StructField("dec", DecimalType(10, 2)),
      StructField("arr", ArrayType(LongType)),
      StructField("m", MapType(StringType, LongType)),
      StructField("nest", StructType(Seq(
        StructField("ns", StringType), StructField("nv", LongType))))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val enc = WireFormat.encode(df, schema.fieldNames.toSeq, 3, dir, Nil)
    val json = WireFormat.loadRegistry(spark, dir)(3)
    val back = WireFormat.decodeId(enc, col("value"), 3, json, Nil)
      .orderBy("id").collect()
    assert(back.length == 2)
    val r0 = back(0)
    assert(r0.getLong(0) == 1L && r0.getInt(1) == 7 &&
      r0.getDouble(2) == 2.5 && r0.getBoolean(3) &&
      r0.getString(4) == "hello" &&
      r0.getAs[Array[Byte]](5).toSeq == Seq[Byte](1, 2) &&
      r0.getTimestamp(6) == ts &&
      r0.getDecimal(7) == new java.math.BigDecimal("12345.67") &&
      r0.getSeq[Long](8) == Seq(1L, 2L, 3L) &&
      r0.getMap[String, Long](9) == Map("a" -> 1L) &&
      r0.getStruct(10) == Row("in", 9L))
    assert((1 to 10).forall(back(1).isNullAt))
  }

  test("a corrupt Avro body (valid header) is DATA, not an executor " +
    "exception: decodeAll routes it to the corrupt side channel with " +
    "a constant reason while clean frames decode unaffected") {
    val dir = Files.createTempDirectory("wf_corrupt").toString
    WireFormat.register(spark, dir, 1, v1Json)
    val schema = new Schema.Parser().parse(v1Json)
    val clean = handFrame(1, schema, r => { r.put("et", "x"); r.put("v", 9L) })
    // header intact, body truncated mid-union: the long branch index
    // arrives but its varint payload never does
    val corrupt = clean.take(5) ++ Array[Byte](2)
    val df = Seq(Tuple1(clean), Tuple1(corrupt)).toDF("value")
    val decoded = WireFormat.decodeAll(df, col("value"), dir, Nil)
    val ok = decoded.batches.head.frame.collect()
    assert(ok.length == 1 && ok.head.getString(0) == "x" &&
      ok.head.getLong(1) == 9L, ok.toSeq)
    val bad = decoded.corrupt.collect()
    assert(bad.length == 1 &&
      bad.head.getAs[String]("dlq_reason") == WireFormat.CorruptBodyReason &&
      bad.head.getAs[Int]("schema_id") == 1, bad.toSeq)
  }

  test("avroToSpark maps logical types: timestamp-micros -> TimestampType, " +
    "decimal bytes -> DecimalType(p,s), enum -> StringType, " +
    "fixed -> BinaryType") {
    val json =
      """{"type":"record","name":"r","fields":[
        |{"name":"t","type":{"type":"long","logicalType":"timestamp-micros"}},
        |{"name":"d","type":{"type":"bytes","logicalType":"decimal",
        |  "precision":9,"scale":3}},
        |{"name":"e","type":{"type":"enum","name":"col",
        |  "symbols":["R","G"]}},
        |{"name":"f","type":{"type":"fixed","name":"fx","size":4}}]}"""
        .stripMargin.replace("\n", "")
    val st = WireFormat.avroToSpark(new Schema.Parser().parse(json))
      .asInstanceOf[StructType]
    assert(st("t").dataType == TimestampType)
    assert(st("d").dataType == DecimalType(9, 3))
    assert(st("e").dataType == StringType)
    assert(st("f").dataType == BinaryType)
  }

  test("versionedBatches splits per id, decodes under each writer schema, " +
    "and SchemaEvolution.resolve(BACKWARD) in v2-first arrival projects " +
    "v1 stragglers onto v2 (missing column null)") {
    val dir = Files.createTempDirectory("wf_vb").toString
    val base = Seq((1L, "a"), (2L, "b")).toDF("v", "et")
    val enc1 = WireFormat.encode(base, Seq("v", "et"), 1, dir, Nil)
    val wide = Seq((3L, "c", 30L)).toDF("v", "et", "extra")
    val enc2 = WireFormat.encode(wide, Seq("v", "et", "extra"), 2, dir, Nil)
    val mixed = enc1.unionByName(enc2)
    val batches = WireFormat.versionedBatches(mixed, col("value"), dir, Nil)
    assert(batches.map(_.schema.version) == Seq(Some(1), Some(2)))
    val groups = SchemaEvolution.resolve(SchemaCompat.Backward,
      batches.reverse)
    assert(groups.size == 1 && groups.head.as.version.contains(2))
    val got = groups.head.frame.orderBy("v")
      .select("v", "et", "extra").collect().toSeq
    assert(got == Seq(Row(1L, "a", null), Row(2L, "b", null),
      Row(3L, "c", 30L)))
  }
}
