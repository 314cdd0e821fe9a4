package graft.ingest

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Path-string contracts from the reference's tests
  * (TopicPartitionWriterTest.java:287, :357-359, :749-789, :2242-2347). */
class PartitionersSpec extends SparkSuite {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): String =
    Seq(1).toDF("x").select(c.as("r")).head.getString(0)

  test("K1 default partitioner: partition=<kafkaPartition>") {
    val r = Seq((0, "v")).toDF("partition", "v")
      .select(Partitioners.defaultPartition(col("partition")).as("e"))
      .head.getString(0)
    assert(r == "partition=0")
  }

  test("K2 field partitioner single field: int=16") {
    val r = Seq(16).toDF("int")
      .select(Partitioners.fieldPartition("int" -> col("int")).as("e"))
      .head.getString(0)
    assert(r == "int=16")
  }

  test("K5 path.format + timezone: Joda pattern renders in the configured " +
    "zone, correct across the DST jump") {
    def fmt(utc: String): String =
      one(Partitioners.timePartition(
        to_timestamp(lit(utc)), "'dt'=YYYY-MM-dd/'hr'=HH", "America/New_York"))
    assert(fmt("2024-01-01 05:30:00") == "dt=2024-01-01/hr=00") // EST -5
    assert(fmt("2024-01-01 03:30:00") == "dt=2023-12-31/hr=22") // date rolls
    assert(fmt("2024-03-10 06:30:00") == "dt=2024-03-10/hr=01") // pre-jump
    assert(fmt("2024-03-10 07:30:00") == "dt=2024-03-10/hr=03") // 02:xx skipped
    assert(fmt("2024-07-01 12:00:00") == "dt=2024-07-01/hr=08") // EDT -4
  }

  test("K5 locale: text month/day tokens render in the configured " +
    "locale; numeric tokens and quoted literals are locale-free; a " +
    "pattern without text tokens ignores locale entirely") {
    val ts = to_timestamp(lit("2024-01-15 12:00:00")) // a Monday
    def fmt(pat: String, loc: String): String =
      one(Partitioners.timePartition(ts, pat, "UTC", loc))
    // French month name, full and short; quoted 'month'= stays literal
    assert(fmt("'month'=MMMM", "fr") == "month=janvier")
    assert(fmt("'month'=MMM/'day'=dd", "fr") == "month=janv./day=15")
    // German full day name alongside numeric tokens
    assert(fmt("'year'=YYYY/'dow'=EEEE", "de") == "year=2024/dow=Montag")
    // Spanish short day name (dayofweek is Sunday-first — Monday must
    // still map to Monday's name)
    assert(fmt("'dow'=EEE", "es") == "dow=lun")
    // numeric-only pattern: locale is a no-op, byte-identical to null
    assert(fmt("'year'=YYYY/'month'=MM", "fr") ==
      one(Partitioners.timePartition(ts, "'year'=YYYY/'month'=MM")))
    // an MM numeric token must NOT be swallowed by the text-token scan
    assert(Partitioners.splitTextTokens("'m'=MM/x=MMMM") ==
      Seq(Right("'m'=MM/x="), Left("MMMM")))
    // quoted M runs are literals, never tokens
    assert(Partitioners.splitTextTokens("'MMMM'=MMM") ==
      Seq(Right("'MMMM'="), Left("MMM")))
    // E is a day-NAME token at EVERY run length (E/EE/EEE are all SHORT
    // style in both Joda and java.time) — a 1-2 char run must NOT fall
    // through to the locale-free passthrough and silently render English
    assert(Partitioners.splitTextTokens("'dow'=EE") ==
      Seq(Right("'dow'="), Left("EEE")))
    assert(fmt("'dow'=EE", "fr") == "dow=lun.")
    assert(fmt("'dow'=E", "de") == "dow=Mo.")
    // quoted E runs stay literal
    assert(Partitioners.splitTextTokens("'EE'=dd") == Seq(Right("'EE'=dd")))
    // the ADT plumbing carries locale through compile
    val df = Seq("2024-01-15 12:00:00").toDF("ts")
    val r = df.select(PartitionerSpec.compile(
      PartitionerSpec.TimeFormat("ts", "'month'=MMMM", "UTC", "fr"),
      lit(0)).as("e")).head.getString(0)
    assert(r == "month=janvier")
  }

  test("K3 multi-field partitioner: f1=v1/f2=v2") {
    val r = Seq(("a", 2)).toDF("f1", "f2")
      .select(Partitioners.fieldPartition(
        "f1" -> col("f1"), "f2" -> col("f2")).as("e"))
      .head.getString(0)
    assert(r == "f1=a/f2=2")
  }

  test("K5/K6 hourly partitioner default path format") {
    val r = Seq("2017-03-02 10:15:00").toDF("s")
      .select(Partitioners.hourlyPartition(col("s").cast("timestamp")).as("e"))
      .head.getString(0)
    assert(r == "year=2017/month=03/day=02/hour=10")
  }

  test("K7 daily partitioner") {
    val r = Seq("2017-03-02 10:15:00").toDF("s")
      .select(Partitioners.dailyPartition(col("s").cast("timestamp")).as("e"))
      .head.getString(0)
    assert(r == "year=2017/month=03/day=02")
  }

  test("K8 schema affix: prefix and suffix, null schema name") {
    assert(one(Partitioners.schemaNameAffix(lit("partition=0"), lit("s1")))
      == "schema_name=s1/partition=0")
    assert(one(Partitioners.schemaNameAffix(lit("partition=0"), lit("s1"),
      prefix = false)) == "partition=0/schema_name=s1")
    assert(one(Partitioners.schemaNameAffix(lit("partition=0"),
      lit(null).cast("string"))) == "schema_name=null/partition=0")
  }

  test("K9 tombstone-aware: null value routes to tombstone") {
    val df = Seq((Some("v"), 3), (None, 4)).toDF("value", "p")
    val r = df.select(Partitioners.tombstoneAware(col("value"),
      Partitioners.defaultPartition(col("p"))).as("e"))
      .collect.map(_.getString(0))
    assert(r.toSeq == Seq("partition=3", "tombstone"))
  }

  test("K12 record-field extractor falls back to record ts for tombstones") {
    val df = Seq((Some("2020-01-01 00:00:00"), "2021-06-01 12:00:00"),
      (None, "2021-06-01 12:00:00")).toDF("field_ts", "record_ts")
    val r = df.select(Partitioners.recordFieldTimestamp(
      col("field_ts").cast("timestamp"),
      col("record_ts").cast("timestamp")).cast("string").as("e"))
      .collect.map(_.getString(0))
    assert(r.toSeq == Seq("2020-01-01 00:00:00", "2021-06-01 12:00:00"))
  }

  test("K13 partitioned path assembly") {
    assert(one(Partitioners.partitionedPath("topics", lit("t"),
      lit("partition=0"))) == "topics/t/partition=0")
  }
}
