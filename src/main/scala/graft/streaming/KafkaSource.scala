package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1: the Kafka source, normalized to the engine's canonical frame — the
  * same 7-tuple the reference's SinkRecord carries (SURVEY §1.1).
  *
  * `format("kafka")` is resolved at runtime (spark-sql-kafka connector on
  * the cluster classpath); this environment has no Kafka jar, so tests
  * drive file-source frames with the same canonical columns — swapping in
  * this source changes nothing downstream.
  */
object KafkaSource {

  /** Canonical column set every ingest operator consumes. */
  val CanonicalColumns: Seq[String] = Seq(
    "key", "value", "topic", "kafka_partition", "offset", "timestamp",
    "headers")

  def stream(spark: SparkSession, bootstrapServers: String, topics: String,
             startingOffsets: String = "latest",
             maxOffsetsPerTrigger: Option[Long] = None): DataFrame = {
    val reader = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics)
      .option("startingOffsets", startingOffsets)
      .option("includeHeaders", "true")
    val withRate = maxOffsetsPerTrigger
      .fold(reader)(n => reader.option("maxOffsetsPerTrigger", n.toString))
    normalize(withRate.load())
  }

  /** Batch variant for backfills over an offset range. */
  def batch(spark: SparkSession, bootstrapServers: String, topics: String,
            startingOffsets: String = "earliest",
            endingOffsets: String = "latest"): DataFrame =
    normalize(spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topics)
      .option("startingOffsets", startingOffsets)
      .option("endingOffsets", endingOffsets)
      .option("includeHeaders", "true")
      .load())

  private def normalize(df: DataFrame): DataFrame =
    df.select(col("key"), col("value"), col("topic"),
      col("partition").as("kafka_partition"), col("offset"),
      col("timestamp"), col("headers"))
}
