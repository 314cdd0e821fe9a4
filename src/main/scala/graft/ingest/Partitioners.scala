package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Partition-key encoders (SURVEY §2.4, K1–K13).
  *
  * The reference computes `encodePartition(record) -> String` row-at-a-time in
  * Java (e.g. `partition=3`, `int=16`, `'year'=2024/'month'=01/...`,
  * `schema_name=s/...`, `tombstone`); observable contracts pinned by
  * `kafka-connect-s3/src/test/java/.../TopicPartitionWriterTest.java:287,357-359,2242-2347`.
  *
  * Re-expressed here as pure `Column`-producing functions so the encoders run
  * inside whole-stage codegen, and so the resulting Hive-style `k=v` layout
  * enables Catalyst partition pruning on read — the property that makes the
  * written data lake queryable at 100 TB.
  */
object Partitioners {

  /** K1 DefaultPartitioner: `partition=<kafkaPartition>`
    * (contract: TopicPartitionWriterTest.java:287). */
  def defaultPartition(kafkaPartition: Column): Column =
    concat(lit("partition="), kafkaPartition.cast("string"))

  /** K2/K3 FieldPartitioner: `f1=v1/f2=v2/...`
    * (TopicPartitionWriterTest.java:329-378 single, :749-789 multi).
    * K4 nested `outer.inner` paths work by passing `col("outer.inner")`. */
  def fieldPartition(fields: (String, Column)*): Column =
    concat_ws("/", fields.map { case (name, c) =>
      concat(lit(name + "="), c.cast("string"))
    }: _*)

  /** K5/K6 TimeBasedPartitioner with the reference's default path format
    * `'year'=YYYY/'month'=MM/'day'=dd/'hour'=HH`
    * (S3SinkConnectorTestBase.java:84-86), Joda pattern mapped to
    * java.time/`date_format`. */
  def hourlyPartition(ts: Column): Column =
    date_format(ts, "'year'=yyyy/'month'=MM/'day'=dd/'hour'=HH")

  /** K7 DailyPartitioner preset. */
  def dailyPartition(ts: Column): Column =
    date_format(ts, "'year'=yyyy/'month'=MM/'day'=dd")

  /** K5 generalized `partition.duration.ms` bucketing of the extracted
    * timestamp (TopicPartitionWriterTest.java:389-392). */
  def timeBucket(ts: Column, durationMs: Long): Column =
    floor(unix_millis(ts) / durationMs)

  /** K5 fully-configurable TimeBasedPartitioner: the reference's
    * `path.format` (Joda pattern, e.g. `'year'=YYYY/'month'=MM/'day'=dd`)
    * and `timezone` keys (S3SinkConnectorConfig PARTITIONER group;
    * TopicPartitionWriterTest.java:357-359 exercises custom formats).
    * Rendering happens in the configured zone: the UTC instant shifts via
    * `from_utc_timestamp`, then `date_format` writes the wall-clock fields.
    * The Joda tokens the reference's configs use translate 1:1 to
    * java.time except `YYYY` (Joda year-of-era vs java.time week-year) —
    * mapped to `yyyy` here. `locale` stays at the JVM/session default, a
    * documented divergence (only affects text month/day names, which the
    * reference's own default formats never use). */
  def timePartition(ts: Column, pathFormat: String,
                    timezone: String = "UTC"): Column =
    date_format(from_utc_timestamp(ts, timezone), jodaToJavaTime(pathFormat))

  /** The Joda→java.time pattern translation for the token subset that
    * appears in reference configs: YYYY→yyyy; quoted literals, MM, dd, HH,
    * mm, ss, M, d, H are identical in both syntaxes. */
  private[ingest] def jodaToJavaTime(pattern: String): String =
    pattern.replace("YYYY", "yyyy")

  /** K8 SchemaPartitioner affix wrapper (util/SchemaPartitioner.java:47-67):
    * prefixes or suffixes `schema_name=<valueSchema.name>`; `null` when
    * schemaless (behavior: TopicPartitionWriterTest.java:2242-2347). */
  def schemaNameAffix(inner: Column, schemaName: Column,
                      prefix: Boolean = true): Column = {
    val affix =
      concat(lit("schema_name="), coalesce(schemaName.cast("string"), lit("null")))
    if (prefix) concat(affix, lit("/"), inner)
    else concat(inner, lit("/"), affix)
  }

  /** K9 TombstoneSupportedPartitioner
    * (util/TombstoneSupportedPartitioner.java:25-48): records with a null
    * value go to a fixed tombstone partition, everything else delegates. */
  def tombstoneAware(value: Column, inner: Column,
                     tombstonePartition: String = "tombstone"): Column =
    when(value.isNull, lit(tombstonePartition)).otherwise(inner)

  /** K12 timestamp extractors. `Wallclock` = `current_timestamp()`,
    * `Record` = the Kafka record timestamp column, `RecordField` = a field of
    * the value struct with tombstone fallback to the record timestamp
    * (util/TombstoneTimestampExtractor.java:40-45). */
  def recordFieldTimestamp(valueField: Column, recordTs: Column): Column =
    coalesce(valueField, recordTs)

  /** K13 partitioned path assembly:
    * `<topicsDir>/<topic>/<encodedPartition>` with configurable delimiter
    * (TopicPartitionWriter.java:618-620,868-873). */
  def partitionedPath(topicsDir: String, topic: Column, encoded: Column,
                      delim: String = "/"): Column =
    concat_ws(delim, lit(topicsDir), topic, encoded)
}
