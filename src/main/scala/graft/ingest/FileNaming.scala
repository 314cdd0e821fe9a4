package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** W13/X1 file-naming contract
  * (TopicPartitionWriter.java:868-883): file identity is
  * `(encodedPartition, startOffset)` and the object key is
  * `<topic>+<kafkaPartition>+<zero-padded startOffset>.<ext>`.
  *
  * Deterministic names are the exactly-once mechanism: replaying a batch
  * regenerates byte-identical keys, so overwrites are idempotent and
  * downstream readers never see duplicates (X1, SURVEY §2.7).
  */
object FileNaming {
  val DefaultPadWidth = 10

  def fileName(topic: Column, kafkaPartition: Column, startOffset: Column,
               ext: String, padWidth: Int = DefaultPadWidth,
               delim: String = "+"): Column =
    concat(
      topic, lit(delim), kafkaPartition.cast("string"), lit(delim),
      lpad(startOffset.cast("string"), padWidth, "0"), lit(ext))
}
