package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P1–P3 record views (format/RecordViews.java:35-121): one Kafka frame
  * `(key, value, headers, ...)` projects to up to three output streams that
  * the K/V/H composite writer (P4) writes in lockstep.
  */
object RecordViews {

  /** P1 ValueRecordView: identity projection of the value struct
    * (format/RecordViews.java:35-50). */
  def valueView(df: DataFrame, valueCol: String = "value"): DataFrame =
    df.select(col(valueCol + ".*"))

  /** P2 KeyRecordView (format/RecordViews.java:52-80): the record key,
    * optionally enveloped as `struct<key: K>` named `RecordKey`. */
  def keyView(df: DataFrame, keyCol: String = "key",
              envelope: Boolean = false): DataFrame =
    if (envelope) df.select(struct(col(keyCol).as("key")).as("RecordKey"))
    else df.select(col(keyCol))

  /** The P3 column transform alone: headers stringified to
    * `array<struct<key: string, value: string>>`
    * (RecordViews.java:106-110 — `Values.convertToString` per header
    * value). Accepts the VERBATIM spark-sql-kafka `includeHeaders`
    * shape (`array<struct<key string, value binary>>` — the cast is a
    * UTF-8 decode) and is a no-op on already-string values, so the K/V/H
    * writer applies it unconditionally. */
  def stringifiedHeaders(headersCol: Column): Column =
    transform(headersCol, e =>
      struct(e.getField("key").cast("string").as("key"),
             e.getField("value").cast("string").as("value")))

  /** P3 HeaderRecordView (format/RecordViews.java:82-121): headers as
    * `array<struct<key: string, value: string>>` with values stringified;
    * optional `RecordHeaders` envelope. */
  def headerView(df: DataFrame, headersCol: String = "headers",
                 envelope: Boolean = false): DataFrame = {
    val h = stringifiedHeaders(col(headersCol))
    if (envelope) df.select(struct(h.as("headers")).as("RecordHeaders"))
    else df.select(h.as("headers"))
  }

  /** F1–F3 null-value behavior (`behavior.on.null.values`,
    * S3SinkTask.java:315-344). */
  sealed trait NullBehavior
  case object IgnoreNulls extends NullBehavior
  case object FailOnNulls extends NullBehavior
  case object WriteNulls extends NullBehavior

  def applyNullBehavior(df: DataFrame, behavior: NullBehavior,
                        valueCol: String = "value"): DataFrame =
    behavior match {
      case IgnoreNulls => df.filter(col(valueCol).isNotNull)
      case FailOnNulls =>
        // raise_error evaluates lazily inside the plan — the reference throws
        // on the first tombstone (S3SinkTask.java:337-341).
        df.withColumn(valueCol,
          when(col(valueCol).isNull,
            raise_error(lit("null value record with behavior.on.null.values=fail")))
            .otherwise(col(valueCol)))
      case WriteNulls => df
    }
}
