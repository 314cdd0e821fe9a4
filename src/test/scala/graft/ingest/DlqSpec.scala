package graft.ingest

import graft.SparkSuite
import org.apache.spark.sql.functions._

class DlqSpec extends SparkSuite {
  import spark.implicits._

  test("F4 routing: first failing reason wins; ok frame is clean and " +
    "reason-free") {
    val df = Seq(
      (1L, """{"k": 1}""", "click"),
      (2L, "not json", "click"),
      (3L, """{"k": 3}""", null),
      (4L, "also not json", null)) // both checks fail → first reason wins
      .toDF("id", "value_json", "event_type")
    val routed = Dlq.route(df, Seq(
      "malformed_json" -> Dlq.malformedJson(col("value_json"), "k INT"),
      "missing_partition_field" -> Dlq.missingPartitionField(col("event_type"))))
    assert(routed.ok.select("id").as[Long].collect().toSeq == Seq(1L))
    assert(!routed.ok.columns.contains("dlq_reason"))
    val dead = routed.deadLetter.select("id", "dlq_reason")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(dead == Seq(
      (2L, "malformed_json"),
      (3L, "missing_partition_field"),
      (4L, "malformed_json")))
  }
}
