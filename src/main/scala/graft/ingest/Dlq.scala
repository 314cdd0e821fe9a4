package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F4 errant-record routing (dead-letter queue).
  *
  * Reference semantics (TopicPartitionWriter.java:364-374,910-927 +
  * S3SinkTask.java:309-313): records whose partition-key computation or
  * format conversion fails are diverted to an error reporter with the
  * failure reason; the stream continues.
  *
  * Spark mapping: failures are expressed as *predicates over the batch*
  * (e.g. unparseable JSON value, missing partition field) rather than
  * caught exceptions — one pass splits the batch into a clean frame and a
  * dead-letter frame that carries the first failing reason per record.
  * Both sides stay lazy; no driver loop, no row-at-a-time error handling.
  */
object Dlq {

  final case class Routed(ok: DataFrame, deadLetter: DataFrame)

  /** Split `df` by ordered failure checks: `(reason, failsWhen)`. A record
    * lands in the dead-letter frame with the FIRST matching reason. */
  def route(df: DataFrame, checks: Seq[(String, Column)]): Routed = {
    val reason = checks.foldRight(lit(null).cast("string")) {
      case ((name, fails), rest) => when(fails, lit(name)).otherwise(rest)
    }
    val tagged = df.withColumn("_dlq_reason", reason)
    Routed(
      ok = tagged.filter(col("_dlq_reason").isNull).drop("_dlq_reason"),
      deadLetter = tagged.filter(col("_dlq_reason").isNotNull)
        .withColumnRenamed("_dlq_reason", "dlq_reason"))
  }

  /** Common check: a JSON value column that does not parse (format-
    * conversion failure class). Without a schema, `try_parse_json` flags
    * syntactically invalid JSON (unlike PERMISSIVE `from_json`, which
    * yields a row of nulls). With `schemaDdl` (e.g. `"k INT"`) the check
    * also enforces conformance: a value none of whose declared fields
    * parses to a non-null under the schema is routed as malformed, so
    * `{"k":"not-an-int"}` fails `"k INT"` even though it is valid JSON. */
  def malformedJson(valueCol: Column, schemaDdl: String = ""): Column =
    if (schemaDdl.isEmpty) valueCol.isNotNull && try_parse_json(valueCol).isNull
    else {
      val parsed = from_json(valueCol, schemaDdl, Map.empty[String, String])
      val allDeclaredNull = org.apache.spark.sql.types.StructType
        .fromDDL(schemaDdl).fieldNames
        .map(f => parsed.getField(f).cast("string").isNull)
        .reduce(_ && _)
      valueCol.isNotNull && allDeclaredNull
    }

  /** Common check: missing partition field (PartitionException class). */
  def missingPartitionField(field: Column): Column = field.isNull
}
