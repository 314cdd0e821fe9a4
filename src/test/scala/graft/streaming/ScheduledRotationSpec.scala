package graft.streaming

import graft.SparkSuite
import graft.ingest.{IngestConfig, PartitionerSpec}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** R4 live scheduled rotation (TopicPartitionWriter.java:543-575,760-796):
  * short files wait in the spill until the day-aligned wall-clock deadline,
  * then commit even if the triggering batch carried no new data for their
  * partition. */
class ScheduledRotationSpec extends SparkSuite {
  import spark.implicits._

  private val T0 = 1704067200000L // 2024-01-01T00:00:00Z

  test("scheduled rotation commits a partial file with no new data for " +
    "its partition once the boundary passes") {
    val out = Files.createTempDirectory("sched_out").toString
    val pend = Files.createTempDirectory("sched_pend").toString
    var now = T0 + 600000L // 00:10
    val ingest = new ScheduledRotationIngest(
      IngestConfig(topic = "sched", flushSize = 3),
      PartitionerSpec.Fields(Seq("f")), out, pend,
      scheduleIntervalMs = 3600000L, clock = () => now)
    assert(ingest.nextScheduledRotationMs == T0 + 3600000L) // 01:00 aligned

    def batch(rows: Seq[(Int, Long, String, String)]) =
      rows.toDF("kafka_partition", "offset", "v", "f")

    // batch 1 @00:10: partition a has 2 records < flushSize → nothing
    // commits, rows spill
    val b1 = ingest.processBatch(batch(Seq(
      (0, 0L, "a0", "a"), (0, 1L, "a1", "a"))))
    assert(b1.isEmpty, b1)

    // batch 2 @00:20: partition b fills a whole file → only b commits;
    // a's spill still waits
    now = T0 + 1200000L
    val b2 = ingest.processBatch(batch(Seq(
      (0, 10L, "b0", "b"), (0, 11L, "b1", "b"), (0, 12L, "b2", "b"))))
    assert(b2.map(_.encodedPartition) == Seq("f=b"), b2)
    assert(b2.head.fileName == "sched+0+0000000010.parquet")

    // batch 3 @01:05: past the 01:00 boundary; batch has ONLY partition b
    // data — partition a's short file must still commit (from the spill)
    now = T0 + 3900000L
    val b3 = ingest.processBatch(batch(Seq((0, 13L, "b3", "b"))))
    assert(ingest.nextScheduledRotationMs == T0 + 2 * 3600000L) // 02:00
    val byPart = b3.groupBy(_.encodedPartition)
    assert(byPart.keySet == Set("f=a", "f=b"), b3)
    assert(byPart("f=a").map(_.fileName) == Seq("sched+0+0000000000.parquet"))
    val aRows = spark.read.parquet(byPart("f=a").head.path)
    assert(aRows.count() == 2) // the short file, committed by schedule
    assert(byPart("f=b").map(_.fileName) == Seq("sched+0+0000000013.parquet"))

    // replay of batch 3 (checkpoint retry): the deadline already advanced,
    // so the short row just re-spills — no loss, no duplicate object
    val b3r = ingest.processBatch(batch(Seq((0, 13L, "b3", "b"))))
    assert(b3r.isEmpty, b3r)
    // ...and the next boundary commits it back to the SAME deterministic
    // key (X1 overwrite), from an empty batch this time
    now = T0 + 2 * 3600000L + 60000L // 02:01
    val b4 = ingest.processBatch(batch(Seq.empty))
    assert(b4.map(_.fileName) == Seq("sched+0+0000000013.parquet"), b4)
  }
}
