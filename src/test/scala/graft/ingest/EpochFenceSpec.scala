package graft.ingest

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** W8/X4 zombie-writer fencing (S3OutputStream.java:363-390 conditional
  * writes, TopicPartitionWriter.java:1011-1053 recovery). */
class EpochFenceSpec extends SparkSuite {
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration

  test("epochs claim atomically and monotonically; stale epochs are fenced") {
    val base = Files.createTempDirectory("fence").toString
    val fence = new EpochFence(base, conf)
    assert(fence.latestEpoch == 0L)
    val e1 = fence.acquire()
    val e2 = fence.acquire()
    assert(e1 == 1L && e2 == 2L && fence.latestEpoch == 2L)
    fence.check(e2) // current generation passes
    val ex = intercept[IllegalStateException](fence.check(e1))
    assert(ex.getMessage.contains("zombie"))
  }

  test("a superseded writer generation cannot keep committing via " +
    "Ingest.run; the live generation can") {
    val base = Files.createTempDirectory("fence_run").toString
    val out = Files.createTempDirectory("fence_out").toString
    val fence = new EpochFence(base, conf)
    val df = Seq((0, 0L, "v", "a"))
      .toDF("kafka_partition", "offset", "value", "f")
    val cfg = IngestConfig(topic = "fenced")
    val old = fence.acquire()
    val live = fence.acquire() // new instance took over
    intercept[IllegalStateException] {
      Ingest.run(df, cfg, PartitionerSpec.Fields(Seq("f")), out,
        payloadCols = Seq(col("offset"), col("value")),
        fence = Some((fence, old)))
    }
    val r = Ingest.run(df, cfg, PartitionerSpec.Fields(Seq("f")), out,
      payloadCols = Seq(col("offset"), col("value")),
      fence = Some((fence, live)))
    assert(r.files.nonEmpty)
  }
}
