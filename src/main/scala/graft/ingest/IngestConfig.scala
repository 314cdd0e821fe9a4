package graft.ingest

/** Typed configuration tree mirroring the reference's throughput/layout knobs
  * (SURVEY §7.1; reference config surface `S3SinkConnectorConfig.java`).
  * No Connect APIs — this is the whole "connector config" re-expressed.
  */
sealed abstract class OutputFormat(val sparkFormat: String, val baseExt: String)
object OutputFormat {
  /** W2 Parquet (format/parquet/ParquetRecordWriterProvider.java:49-192).
    * Codec-prefixed extension contract `:62-65` (e.g. `.snappy.parquet`). */
  case object Parquet extends OutputFormat("parquet", ".parquet")
  /** W1 Avro (format/avro/AvroRecordWriterProvider.java:61-121). */
  case object Avro extends OutputFormat("avro", ".avro")
  /** W3 JSON lines (format/json/JsonRecordWriterProvider.java:44-123). */
  case object Json extends OutputFormat("json", ".json")
  /** W4 raw bytes with line separator
    * (format/bytearray/ByteArrayRecordWriterProvider.java:38-92). */
  case object ByteArray extends OutputFormat("text", ".bin")
}

/** `json.decimal.format` (S3SinkConnectorConfig.java:214-219): how the JSON
  * writer serializes decimals — BASE64 (reference default; base64 of the
  * unscaled value at the declared scale) or NUMERIC (plain number). */
sealed trait JsonDecimalFormat
object JsonDecimalFormat {
  case object Base64 extends JsonDecimalFormat
  case object Numeric extends JsonDecimalFormat
}

final case class IngestConfig(
    topic: String,
    format: OutputFormat = OutputFormat.Parquet,
    /** R1 `flush.size`: records per output file. */
    flushSize: Int = 1000,
    /** W13 `filename.offset.zero.pad.width`. */
    padWidth: Int = FileNaming.DefaultPadWidth,
    /** `topics.dir` path prefix. */
    topicsDir: String = "topics",
    /** W5 gzip for Json/ByteArray, or the columnar codec for
      * Parquet/Avro (`parquet.codec` / `avro.codec`). */
    compression: Option[String] = None,
    /** R2 `rotate.interval.ms` (None = disabled, the reference default). */
    rotateIntervalMs: Option[Long] = None,
    /** R2 semantics choice: false (default) = deterministic epoch-aligned
      * buckets; true = the reference's exact sequential rule (file base
      * resets on rotation, TopicPartitionWriter.java:663-665) via a
      * task-side fold — one extra shuffle. */
    rotateFileBase: Boolean = false,
    /** K12 extractor column driving R2 rotation (`timestamp.field`). */
    timestampColumn: String = "ts",
    /** F1–F3 `behavior.on.null.values`. */
    nullBehavior: RecordViews.NullBehavior = RecordViews.IgnoreNulls,
    /** P4 `store.kafka.keys` / `store.kafka.headers`. */
    writeKeys: Boolean = false,
    writeHeaders: Boolean = false,
    /** `keys.format.class` / `headers.format.class`
      * (S3SinkConnectorConfig.java:223-226, 280-287): each sidecar view
      * carries its OWN format — the reference default is AVRO even when
      * the value format is Parquet, so a default K/V/H lake is
      * `t+0+0.parquet` + `t+0+0.keys.avro` + `t+0+0.headers.avro`. */
    keyFormat: OutputFormat = OutputFormat.Avro,
    headerFormat: OutputFormat = OutputFormat.Avro,
    /** `json.decimal.format` — BASE64 is the reference default. */
    jsonDecimalFormat: JsonDecimalFormat = JsonDecimalFormat.Base64,
    /** W4 `format.bytearray.separator` (reference default: line separator,
      * ByteArrayRecordWriterProvider.java:38-50). */
    byteArraySeparator: String = "\n",
    /** W4 `format.bytearray.extension` (reference default ".bin",
      * S3SinkConnectorConfig.java) — only ByteArray lakes honor it. */
    byteArrayExtension: String = ".bin",
    /** `report.null.values.to.dlq` (reference default TRUE,
      * S3SinkConnectorConfig.java:181-186): under IgnoreNulls, dropped
      * tombstones surface on `Ingest.Result.reportedNulls` for DLQ
      * routing instead of vanishing silently. */
    reportNullsToDlq: Boolean = true,
    /** Data-skipping stats (extension beyond the reference, the
      * Delta/Iceberg per-file min/max discipline): NUMERIC payload
      * columns whose per-object [min, max] ride in the commit manifest,
      * letting `readCommitted(rangePredicates = ...)` prune objects
      * before any read. Pair with z-order layout — clustering is what
      * makes the ranges tight enough to skip. */
    statsColumns: Seq[String] = Nil) {

  private def baseExt: String = format match {
    case OutputFormat.ByteArray => byteArrayExtension
    case f => f.baseExt
  }

  /** Extension contract: gzip suffixes Json/ByteArray (CompressionType.java),
    * Parquet prefixes the codec (ParquetRecordWriterProvider.java:62-65). */
  def extension: String = (format, compression) match {
    case (OutputFormat.Parquet, Some(c)) if c != "none" => s".$c$baseExt"
    case (OutputFormat.Json | OutputFormat.ByteArray, Some("gzip")) =>
      s"$baseExt.gz"
    case _ => baseExt
  }

  /** Sidecar view extensions (Utils.java:31-40): the view infix is
    * inserted before the VIEW format's own extension — `file1.keys.avro`
    * for the default Avro keys next to Parquet values. */
  def keyExtension: String = ".keys" + copy(format = keyFormat).extension
  def headerExtension: String =
    ".headers" + copy(format = headerFormat).extension
}
