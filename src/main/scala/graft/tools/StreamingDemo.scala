package graft.tools

import graft.ingest.{IngestConfig, Partitioners}
import graft.streaming.StreamingIngest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end streaming drive: file-source micro-batches → foreachBatch
  * ingest → reference layout; then a second batch arrives and only the new
  * offsets are written (checkpointed exactly-once). Kafka in production
  * swaps the source line only.
  *
  * Usage: tools/run.sh graft.tools.StreamingDemo [workDir]
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse(
      s"/tmp/graft_stream_demo_${System.currentTimeMillis}")
    val (src, out, ckpt) = (s"$work/src", s"$work/out", s"$work/ckpt")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val schema = StructType(Seq(
      StructField("kafka_partition", IntegerType),
      StructField("offset", LongType),
      StructField("event_type", StringType)))

    def emit(base: Long): Unit =
      (0L until 50L).map(i => ((i % 2).toInt, base + i, s"t${i % 3}"))
        .toDF("kafka_partition", "offset", "event_type")
        .coalesce(1).write.mode("append").parquet(src)

    def runBatchesOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(src)
      val q = StreamingIngest.start(stream,
        IngestConfig(topic = "demo", flushSize = 20),
        Partitioners.fieldPartition("event_type" -> col("event_type")),
        out, ckpt, col("kafka_partition"), col("offset"),
        payloadCols = Seq(col("offset"), col("event_type")))
      q.awaitTermination(120000)
    }

    emit(0)
    runBatchesOnce()
    val after1 = spark.read.parquet(s"$out/topics/demo/*").count()
    println(s"== after batch 1: $after1 records in layout")

    emit(50)
    runBatchesOnce()
    val after2 = spark.read.parquet(s"$out/topics/demo/*").count()
    println(s"== after batch 2: $after2 records in layout")
    require(after1 == 50 && after2 == 100,
      s"expected 50 then 100 records, got $after1 then $after2")

    val dirs = new java.io.File(s"$out/topics/demo").listFiles()
      .map(_.getName).sorted.toSeq
    println(s"== partition dirs: ${dirs.mkString(", ")}")
    val sample = new java.io.File(s"$out/topics/demo/${dirs.head}")
      .listFiles().map(_.getName).filterNot(_.startsWith(".")).sorted.toSeq
    println(s"== ${dirs.head}: ${sample.mkString(", ")}")
    println("== streaming ingest exactly-once demo OK")
    spark.stop()
  }
}
