package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative partitioner configuration — the Spark equivalent of the
  * reference's `partitioner.class` + related keys (S3SinkConnectorConfig
  * .java:300-308), as a composable ADT instead of reflection. */
sealed trait PartitionerSpec
object PartitionerSpec {
  /** K1: partition=<kafkaPartition>. */
  case object Default extends PartitionerSpec
  /** K2/K3/K4: `partition.field.name` list; dotted paths reach into structs. */
  final case class Fields(names: Seq[String]) extends PartitionerSpec
  /** K5-K7: time-based with the reference's default path format at the given
    * granularity, driven by `timestampColumn` (K12 extractor choice). */
  final case class Hourly(timestampColumn: String) extends PartitionerSpec
  final case class Daily(timestampColumn: String) extends PartitionerSpec
  /** K8 wrapper: affix schema_name=<name>. */
  final case class SchemaAffix(inner: PartitionerSpec, schemaName: String,
                               prefix: Boolean = true) extends PartitionerSpec
  /** K9 wrapper: null `valueColumn` routes to the tombstone partition. */
  final case class TombstoneAware(inner: PartitionerSpec, valueColumn: String,
                                  tombstonePartition: String = "tombstone")
      extends PartitionerSpec
  /** K11: user-supplied expression. */
  final case class Custom(encoded: Column) extends PartitionerSpec

  /** Compile the spec to a Column (K10 wrapper-chain composition). */
  def compile(spec: PartitionerSpec, kafkaPartition: Column): Column =
    spec match {
      case Default => Partitioners.defaultPartition(kafkaPartition)
      case Fields(names) =>
        Partitioners.fieldPartition(names.map(n => n -> col(n)): _*)
      case Hourly(ts) => Partitioners.hourlyPartition(col(ts).cast("timestamp"))
      case Daily(ts) => Partitioners.dailyPartition(col(ts).cast("timestamp"))
      case SchemaAffix(inner, name, prefix) =>
        Partitioners.schemaNameAffix(compile(inner, kafkaPartition),
          lit(name), prefix)
      case TombstoneAware(inner, valueCol, tomb) =>
        Partitioners.tombstoneAware(col(valueCol),
          compile(inner, kafkaPartition), tomb)
      case Custom(c) => c
    }
}

/** The whole connector, config-driven: null handling → partition-key
  * computation → rotation grouping → partitioned write (+ K/V/H views) —
  * the single call a reference user swaps their connector config for.
  * Streaming callers wrap this in foreachBatch (StreamingIngest.start). */
object Ingest {

  final case class Result(files: Seq[IngestWriter.FileInfo],
                          stats: RotationStats)

  def run(frame: DataFrame, cfg: IngestConfig, partitioner: PartitionerSpec,
          outDir: String,
          kafkaPartition: Column = col("kafka_partition"),
          offset: Column = col("offset"),
          payloadCols: Seq[Column],
          valueColumnForNulls: Option[String] = None,
          writeManifest: Boolean = false): Result = {
    val cleaned = valueColumnForNulls match {
      case Some(v) => RecordViews.applyNullBehavior(frame, cfg.nullBehavior, v)
      case None => frame
    }
    val encoded = PartitionerSpec.compile(partitioner, kafkaPartition)
    val extraGroups = cfg.rotateIntervalMs.toSeq.map(iv =>
      Rotation.timeFileGroup(col(cfg.timestampColumn).cast("timestamp"), iv))
    val files =
      if (cfg.writeKeys || cfg.writeHeaders)
        IngestWriter.writeKVH(cleaned, cfg, encoded, outDir, kafkaPartition,
          offset, payloadCols)
      else
        IngestWriter.write(cleaned, cfg, encoded, outDir, kafkaPartition,
          offset, payloadCols, extraFileGroups = extraGroups)
    val stats = RotationStats.of(files)
    if (writeManifest)
      CommitManifest.write(cleaned, cfg, encoded, outDir, kafkaPartition,
        offset, extraGroups)
    Result(files, stats)
  }
}

/** R10 rotation diagnostics (util/FileRotationTracker.java:22-171): the
  * reference counts rotations by cause per partition and logs a 5-minute
  * diagnostic. Here the write is declarative, so the diagnostics derive
  * from the commit manifest: objects per encoded partition and total. */
final case class RotationStats(totalFiles: Int,
                               filesPerPartition: Map[String, Int]) {
  def diagnostic: String =
    s"rotations: $totalFiles files across ${filesPerPartition.size} " +
      s"partitions; top=" + filesPerPartition.toSeq.sortBy(-_._2).take(5)
      .map { case (p, n) => s"$p:$n" }.mkString(",")
}
object RotationStats {
  def of(files: Seq[IngestWriter.FileInfo]): RotationStats =
    RotationStats(files.size,
      files.groupBy(_.encodedPartition).map { case (p, fs) => p -> fs.size })
}

/** W10 object tagging (TopicPartitionWriter.java:955-1102): the reference
  * tags each committed object with startOffset/endOffset/recordCount. S3
  * object tags are an S3-API feature; the engine-level equivalent is a
  * commit manifest — one JSON line per object with the same fields —
  * written next to the data under `_graft_manifest/`. Downstream consumers
  * get the exactly-once audit trail without re-listing objects. */
object CommitManifest {
  def write(df: DataFrame, cfg: IngestConfig, encodedPartition: Column,
            outDir: String, kafkaPartition: Column, offset: Column,
            extraGroups: Seq[Column]): String = {
    val groupKey = Seq(kafkaPartition, encodedPartition) ++ extraGroups
    val grouped = Rotation.assignSizeFiles(
      df.withColumn("__epart", encodedPartition), struct(groupKey: _*),
      offset, cfg.flushSize)
    val stats = grouped
      .groupBy(col("__epart").as("encoded_partition"),
        kafkaPartition.as("kafka_partition"),
        col(Rotation.StartOffsetCol).as("start_offset"))
      .agg(max(offset).as("end_offset"), count(lit(1)).as("record_count"))
      .withColumn("object_key", concat(col("encoded_partition"), lit("/"),
        FileNaming.fileName(lit(cfg.topic), col("kafka_partition"),
          col("start_offset"), cfg.extension, cfg.padWidth)))
      .orderBy(col("object_key"))
    val rows = stats.collect().map { r =>
      s"""{"object_key":"${r.getAs[String]("object_key")}",""" +
        s""""start_offset":${r.getAs[Long]("start_offset")},""" +
        s""""end_offset":${r.getAs[Long]("end_offset")},""" +
        s""""record_count":${r.getAs[Long]("record_count")}}"""
    }
    val dest = new org.apache.hadoop.fs.Path(
      s"$outDir/${cfg.topicsDir}/${cfg.topic}/_graft_manifest/commit.json")
    val fs = dest.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(dest, true)
    out.write((rows.mkString("\n") + "\n").getBytes("UTF-8"))
    out.close()
    dest.toString
  }
}
