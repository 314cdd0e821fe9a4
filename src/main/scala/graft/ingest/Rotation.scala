package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rotation predicates (SURVEY §2.5) re-expressed as deterministic
  * file-group assignment.
  *
  * The reference rotates imperatively as records stream through a state
  * machine (`TopicPartitionWriter.java:426-528`). In the Spark model a "file"
  * is a group key computed declaratively from the data; the writer emits one
  * object per group. This is order-independent and therefore replay-safe,
  * which is what makes exactly-once (X1) free under micro-batch retry.
  */
object Rotation {
  val FileIndexCol = "_file_index"
  val StartOffsetCol = "_file_start_offset"

  /** R1 size-based rotation (`flush.size`,
    * TopicPartitionWriter.java:813-823): within each encoded partition,
    * consecutive records in offset order fill files of `flushSize` records;
    * each file's name derives from its min offset (X1). Adds
    * `_file_index` and `_file_start_offset`.
    *
    * Scale note: the window shuffles once by `partitionCol` and both window
    * functions share that single shuffle (same partitioning + ordering).
    */
  def assignSizeFiles(df: DataFrame, partitionCol: Column, offsetCol: Column,
                      flushSize: Int): DataFrame = {
    require(flushSize > 0, "flush.size must be positive")
    val w = Window.partitionBy(partitionCol).orderBy(offsetCol)
    val withIdx =
      df.withColumn(FileIndexCol, floor((row_number().over(w) - 1) / flushSize))
    val wf = Window.partitionBy(partitionCol, col(FileIndexCol))
    withIdx.withColumn(StartOffsetCol, min(offsetCol).over(wf))
  }

  /** R2 event-time rotation (`rotate.interval.ms`,
    * TopicPartitionWriter.java:658-702): bucket by
    * `floor(extractedTs / interval)`.
    *
    * Documented divergence: the reference's predicate is
    * `ts - firstRecordTsOfFile >= interval` (file base resets on rotation —
    * a sequential, arrival-order-dependent rule). Fixed epoch-aligned
    * buckets give the same file cadence for in-order data but are
    * deterministic under replay and parallelism, which the reference's rule
    * is not. */
  def timeFileGroup(ts: Column, intervalMs: Long): Column =
    floor(unix_millis(ts) / intervalMs)

  /** R4 wall-clock scheduled rotation maps to streaming trigger cadence
    * (`Trigger.ProcessingTime`); within a batch there is nothing to assign.
    * Exposed for completeness: the next day-aligned fire time in `tz`
    * (reference: DateTimeUtils.getNextTimeAdjustedByDay,
    * TopicPartitionWriter.java:775-796). */
  def nextScheduledRotation(nowMs: Long, intervalMs: Long,
                            tz: java.time.ZoneId): Long = {
    val now = java.time.Instant.ofEpochMilli(nowMs).atZone(tz)
    val dayStart = now.toLocalDate.atStartOfDay(tz).toInstant.toEpochMilli
    val sinceDayStart = nowMs - dayStart
    dayStart + ((sinceDayStart / intervalMs) + 1) * intervalMs
  }

  /** R5 schema-change rotation: group by schema version so each file holds a
    * single schema (TopicPartitionWriter.java:471-488). */
  def schemaFileGroup(schemaVersion: Column): Column = schemaVersion

  /** R6 tombstone/non-tombstone transition rotation: null-value rows never
    * share a file with data rows (TopicPartitionWriter.java:380-403). */
  def tombstoneFileGroup(value: Column): Column = value.isNull
}
