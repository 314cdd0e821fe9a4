package graft.ingest

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RotationSpec extends SparkSuite {
  import spark.implicits._

  test("R1 flush.size=3 produces files at start offsets 0,3,6 " +
    "(reference quickstart contract, TopicPartitionWriterTest.java:288-292)") {
    val df = (0L to 8L).map(o => (0, o)).toDF("part", "offset")
    val assigned = Rotation.assignSizeFiles(df, col("part"), col("offset"), 3)
    val starts = assigned.select(col(Rotation.StartOffsetCol)).distinct()
      .as[Long].collect().sorted
    assert(starts.toSeq == Seq(0L, 3L, 6L))
    val counts = assigned.groupBy(col(Rotation.FileIndexCol)).count()
      .as[(Long, Long)].collect().toMap
    assert(counts == Map(0L -> 3L, 1L -> 3L, 2L -> 3L))
  }

  test("R1 file assignment is per-partition and offset-ordered") {
    val df = Seq((0, 10L), (1, 5L), (0, 11L), (1, 6L), (0, 12L), (0, 13L))
      .toDF("part", "offset")
    val assigned = Rotation.assignSizeFiles(df, col("part"), col("offset"), 3)
    val r = assigned.select(col("part"), col("offset"),
      col(Rotation.FileIndexCol), col(Rotation.StartOffsetCol))
      .as[(Int, Long, Long, Long)].collect().sortBy(t => (t._1, t._2))
    assert(r.toSeq == Seq(
      (0, 10L, 0L, 10L), (0, 11L, 0L, 10L), (0, 12L, 0L, 10L),
      (0, 13L, 1L, 13L),
      (1, 5L, 0L, 5L), (1, 6L, 0L, 5L)))
  }

  test("R2 time buckets: epoch-aligned floor(ts/interval)") {
    val df = Seq("2024-01-01 00:10:00", "2024-01-01 00:59:59",
      "2024-01-01 01:00:00").toDF("s")
    val r = df.select(Rotation.timeFileGroup(col("s").cast("timestamp"),
      3600000L).as("b")).as[Long].collect()
    assert(r(0) == r(1) && r(2) == r(0) + 1)
  }

  test("R4 next scheduled rotation is day-aligned in the given timezone " +
    "(reference DateTimeUtils.getNextTimeAdjustedByDay)") {
    val tz = java.time.ZoneId.of("America/Los_Angeles")
    // 2017-03-02 10:17 PST; hourly schedule → next fire 11:00 PST
    val now = java.time.ZonedDateTime.of(2017, 3, 2, 10, 17, 0, 0, tz)
      .toInstant.toEpochMilli
    val next = Rotation.nextScheduledRotation(now, 3600000L, tz)
    val expect = java.time.ZonedDateTime.of(2017, 3, 2, 11, 0, 0, 0, tz)
      .toInstant.toEpochMilli
    assert(next == expect)
  }

  test("R4 day alignment across the spring-forward DST boundary") {
    val tz = java.time.ZoneId.of("America/Los_Angeles")
    // 2017-03-12: 02:00 PST jumps to 03:00 PDT. At 01:30 PST with a 1h
    // schedule, day-start+floor model fires at the next whole interval
    // after 1.5h-since-day-start = 2h → 02:00 PST wall = 03:00 PDT.
    val now = java.time.ZonedDateTime.of(2017, 3, 12, 1, 30, 0, 0, tz)
      .toInstant.toEpochMilli
    val next = Rotation.nextScheduledRotation(now, 3600000L, tz)
    assert(next - now == 1800000L)
  }

  test("R6 tombstone file grouping separates null and non-null values") {
    val df = Seq(Some("a"), None, Some("b")).toDF("value")
    val groups = df.select(Rotation.tombstoneFileGroup(col("value")).as("g"))
      .as[Boolean].collect()
    assert(groups.toSeq == Seq(false, true, false))
  }

  test("R2 file-base reset matches the reference's sequential rule where " +
    "epoch-aligned buckets differ (TopicPartitionWriter.java:663-665)") {
    // interval 100ms; ts per offset: 90,120,185,210.
    // file-base: base=90 -> 120,185 stay (<100 from base), 210 rotates
    //   (210-90=120): groups 0,0,0,1.
    // epoch-aligned floor(ts/100) would give 0,1,1,2 — the divergence.
    val df = Seq((0, 0L, 90L), (0, 1L, 120L), (0, 2L, 185L), (0, 3L, 210L))
      .toDF("part", "offset", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    val folded = Rotation.assignFileBaseTimeGroups(df, col("part"),
      col("offset"), col("ts"), 100L)
    val groups = folded.select(col("offset"), col(Rotation.TimeGroupCol))
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    assert(groups.toSeq == Seq(0L, 0L, 0L, 1L))
    val epochGroups = df.select(
      Rotation.timeFileGroup(col("ts"), 100L).as("g")).as[Long].collect()
    assert(epochGroups.toSeq == Seq(0L, 1L, 1L, 2L))
  }

  test("R2 file-base fold is per-key and keys never bleed state") {
    val df = Seq(
      (0, 0L, 0L), (0, 1L, 150L), // key 0 rotates at 150
      (1, 0L, 140L), (1, 1L, 160L)) // key 1's base is 140 — no rotation
      .toDF("part", "offset", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    val folded = Rotation.assignFileBaseTimeGroups(df, col("part"),
      col("offset"), col("ts"), 100L)
    val r = folded.select(col("part"), col("offset"),
      col(Rotation.TimeGroupCol))
      .as[(Int, Long, Long)].collect().sortBy(t => (t._1, t._2))
    assert(r.toSeq == Seq((0, 0L, 0L), (0, 1L, 1L), (1, 0L, 0L), (1, 1L, 0L)))
  }

  test("R2 file-base fold matches a brute-force sequential reference on " +
    "randomized multi-key timestamp streams") {
    val rnd = new scala.util.Random(42)
    val rows = for {
      key <- 0 until 5
      off <- 0 until 80
    } yield (key, off.toLong,
      // jittery, occasionally-backward event times
      off * 40L + rnd.nextInt(120) - 30L)
    val df = rows.toDF("part", "offset", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    val interval = 100L
    val got = Rotation.assignFileBaseTimeGroups(df, col("part"),
      col("offset"), col("ts"), interval)
      .select(col("part"), col("offset"), col(Rotation.TimeGroupCol))
      .as[(Int, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    // brute-force per-key sequential fold (the reference's state machine)
    rows.groupBy(_._1).foreach { case (key, rs) =>
      var base = Long.MinValue
      var group = -1L
      rs.sortBy(_._2).foreach { case (_, off, ms) =>
        if (group < 0 || ms - base >= interval) { base = ms; group += 1 }
        assert(got((key, off)) == group,
          s"key=$key off=$off ms=$ms: got ${got((key, off))}, want $group")
      }
    }
  }

  test("R2 file-base mode end-to-end: Ingest.run rotates on the " +
    "sequential rule and names files by each group's min offset") {
    val out = java.nio.file.Files.createTempDirectory("rot_fb").toString
    val df = Seq((0, 0L, 90L, "a"), (0, 1L, 120L, "b"), (0, 2L, 185L, "c"),
      (0, 3L, 210L, "d"))
      .toDF("kafka_partition", "offset", "ms", "value")
      .withColumn("ts", timestamp_millis(col("ms")))
    val cfg = IngestConfig(topic = "fb", flushSize = 100,
      rotateIntervalMs = Some(100L), rotateFileBase = true)
    val r = Ingest.run(df, cfg, PartitionerSpec.Default, out,
      payloadCols = Seq(col("offset"), col("value")), causeStats = true)
    assert(r.files.map(_.fileName).sorted == Seq(
      "fb+0+0000000000.parquet", "fb+0+0000000003.parquet"))
    assert(r.stats.byCause.getOrElse("rotate_interval", 0L) == 1L,
      r.stats.byCause)
  }

  test("R2 file-base rotation shares ONE base per kafka partition: a " +
    "rotation closes every encoded partition's file (TopicPartitionWriter" +
    ".java:103,984 — commitFiles resets the writer-wide base)") {
    val out = java.nio.file.Files.createTempDirectory("rot_fb_multi").toString
    // One kafka partition fanning out to two encoded partitions (field
    // partitioner). Offset order: x@0 seeds base=0; y@90 shares the file
    // era (90-0<100); x@150 rotates the WRITER (150-0>=100, base:=150);
    // y@170 lands in the new era (170-150<100). Per-(kpart,epart) bases
    // would give y a base of 90 and never rotate it (170-90<100) — the
    // divergence this test pins against.
    val df = Seq((0, 0L, 0L, "x"), (0, 1L, 90L, "y"), (0, 2L, 150L, "x"),
      (0, 3L, 170L, "y"))
      .toDF("kafka_partition", "offset", "ms", "cat")
      .withColumn("ts", timestamp_millis(col("ms")))
    val cfg = IngestConfig(topic = "fbm", flushSize = 100,
      rotateIntervalMs = Some(100L), rotateFileBase = true)
    val r = Ingest.run(df, cfg, PartitionerSpec.Fields(Seq("cat")), out,
      payloadCols = Seq(col("offset"), col("cat")))
    assert(r.files.map(f => (f.encodedPartition, f.fileName)).sorted == Seq(
      ("cat=x", "fbm+0+0000000000.parquet"),
      ("cat=x", "fbm+0+0000000002.parquet"),
      ("cat=y", "fbm+0+0000000001.parquet"),
      ("cat=y", "fbm+0+0000000003.parquet")))
  }

  test("R3 rotate.file.on.partition.change=false × flush.size: files " +
    "accumulate per encoded partition across changes and the WRITER-global " +
    "size trigger commits every open file (TopicPartitionWriter.java:814 " +
    "recordCount is global; :959-983 commitFiles closes all)") {
    // one writer, eps interleave a,b,a,b,... — under rotate=TRUE this
    // stream would cut a file at EVERY change (9 one-record files); with
    // the change rotation OFF the era is floor(rank/3) and each era holds
    // one file per ep, named by the ep's first offset in the era
    val df = (0L to 8L).map(o => (0, o, if (o % 2 == 0) "a" else "b"))
      .toDF("writer", "offset", "ep")
    val assigned = Rotation.assignWriterSizeFiles(df, col("writer"),
      col("ep"), col("offset"), flushSize = 3)
    val files = assigned
      .groupBy(col("ep"), col(Rotation.EraCol),
        col(Rotation.StartOffsetCol))
      .count()
      .as[(String, Long, Long, Long)].collect().toSet
    assert(files == Set(
      ("a", 0L, 0L, 2L), ("b", 0L, 1L, 1L),   // era 0: offsets 0,1,2
      ("b", 1L, 3L, 2L), ("a", 1L, 4L, 1L),   // era 1: offsets 3,4,5
      ("a", 2L, 6L, 2L), ("b", 2L, 7L, 1L)),  // era 2: offsets 6,7,8
      s"unexpected layout: $files")
    // eras never straddle writers
    val multi = df.union(Seq((1, 100L, "a")).toDF("writer", "offset", "ep"))
    val w1 = Rotation.assignWriterSizeFiles(multi, col("writer"),
      col("ep"), col("offset"), flushSize = 3)
      .filter(col("writer") === 1)
      .select(col(Rotation.EraCol), col(Rotation.StartOffsetCol))
      .as[(Long, Long)].collect().toSeq
    assert(w1 == Seq((0L, 100L)))
  }

  test("R3=false time-based layout reproduces the reference's out-of-order " +
    "hour fixture (TopicPartitionWriterTest.java:655-708): accumulated " +
    "per-hour files commit together on the writer-global time rotation, " +
    "named by each hour's first offset") {
    // offsets 0-4 against a 10-min interval, hourly encoded partitions,
    // LA wall-clock 2017-03-02 10:00 — ts minutes: +0, -2, +9, -5, +10.
    // Base seeds at 0; offset 4 (+10min) is the first to clear the
    // interval, committing BOTH accumulated files: hour-10 {0,2} named
    // offset 0 and hour-09 {1,3} named offset 1 (the reference's two
    // expectedFiles); offset 4 then opens era 1 (committed at batch end
    // in this engine's batch model — the reference leaves it pending).
    val h = java.time.ZonedDateTime.of(2017, 3, 2, 10, 0, 0, 0,
      java.time.ZoneId.of("America/Los_Angeles")).toInstant.toEpochMilli
    def min(m: Long) = h + m * 60000L
    val df = Seq((0, 0L, min(0)), (0, 1L, min(-2)), (0, 2L, min(9)),
      (0, 3L, min(-5)), (0, 4L, min(10)))
      .toDF("writer", "offset", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
      .withColumn("ep",
        concat(lit("hour="), hour(from_utc_timestamp(col("ts"),
          "America/Los_Angeles"))))
    val folded = Rotation.assignFileBaseTimeGroups(df, col("writer"),
      col("offset"), col("ts"), 600000L)
    val files = folded
      .groupBy(col("ep"), col(Rotation.TimeGroupCol))
      .agg(org.apache.spark.sql.functions.min(col("offset")).as("start"),
        count(lit(1)).as("n"))
      .select(col("ep"), col(Rotation.TimeGroupCol), col("start"), col("n"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(files == Set(
      ("hour=10", 0L, 0L, 2L),  // reference expectedFiles[0]: offset 0
      ("hour=9", 0L, 1L, 2L),   // reference expectedFiles[1]: offset 1
      ("hour=10", 1L, 4L, 1L)), // pending at close in the reference
      s"unexpected layout: $files")
  }

  test("R2 file-base fold: null event times stay in the current file and " +
    "never advance the base (extractor-guard behavior)") {
    val df = Seq((0, 0L, Some(0L)), (0, 1L, None), (0, 2L, Some(50L)),
      (0, 3L, Some(150L)))
      .toDF("part", "offset", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    val folded = Rotation.assignFileBaseTimeGroups(df, col("part"),
      col("offset"), col("ts"), 100L)
    val groups = folded.select(col("offset"), col(Rotation.TimeGroupCol))
      .as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    // base=0; null stays; 50 stays; 150 rotates
    assert(groups.toSeq == Seq(0L, 0L, 0L, 1L))
  }
}
