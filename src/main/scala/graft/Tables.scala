package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided test tables (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** `events.ts` has shipped in two physical shapes across driver testdata
    * generations, so the conversion is conditional on the READ schema:
    *
    *  - parquet TIMESTAMP(NANOS): Spark 4 refuses to read it as a timestamp
    *    (PARQUET_TYPE_ILLEGAL); with `nanosAsLong` it surfaces as int64
    *    nanos. Convert with exact integer division — `ts div 1000` then
    *    `timestamp_micros` — the same ns→µs truncation DuckDB applies in
    *    `CAST(ts AS TIMESTAMP)`. (Float division would lose sub-µs
    *    precision: 2024 epoch-nanos ≈ 1.7e18 exceeds a double's 53-bit
    *    mantissa.)
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): reads natively as
    *    TIMESTAMP_NTZ. Cast to the session-timezone TimestampType — the
    *    session zone is pinned to UTC everywhere (Verify/Bench/specs), so
    *    the instant is identical and downstream code keeps the single
    *    timestamp type it has always seen. A UTC-adjusted MICROS/MILLIS
    *    column already reads as TimestampType and passes through the same
    *    cast unchanged. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      val ts = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          timestamp_micros(expr("ts div 1000"))
        case _ => col("ts").cast("timestamp")
      }
      raw.withColumn("ts", ts)
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
