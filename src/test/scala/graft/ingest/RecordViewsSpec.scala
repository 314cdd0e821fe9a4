package graft.ingest

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RecordViewsSpec extends SparkSuite {
  import spark.implicits._

  private def frame() = Seq(
    ("k1", ("a", 1), Seq(("h1", "x"))),
    ("k2", ("b", 2), Seq(("h2", "y"), ("h3", "z"))))
    .toDF("key", "value", "headers")
    .withColumn("value", col("value").cast("struct<f1:string,f2:int>"))
    .withColumn("headers",
      transform(col("headers"),
        h => struct(h.getField("_1").as("key"), h.getField("_2").as("value"))))

  test("P1 value view flattens the value struct") {
    val v = RecordViews.valueView(frame())
    assert(v.columns.toSeq == Seq("f1", "f2"))
    assert(v.orderBy("f1").as[(String, Int)].collect().toSeq ==
      Seq(("a", 1), ("b", 2)))
  }

  test("P2 key view envelopes as struct<key> named RecordKey " +
    "(RecordViews.java:52-80)") {
    val k = RecordViews.keyView(frame(), envelope = true)
    assert(k.columns.toSeq == Seq("RecordKey"))
    assert(k.select(col("RecordKey.key")).orderBy("key").as[String]
      .collect().toSeq == Seq("k1", "k2"))
  }

  test("P3 header view stringifies values, keeps order " +
    "(RecordViews.java:82-121)") {
    val h = RecordViews.headerView(frame())
    val rows = h.select(explode(col("headers")).as("h"))
      .select(col("h.key"), col("h.value")).as[(String, String)]
      .collect().toSeq
    assert(rows == Seq(("h1", "x"), ("h2", "y"), ("h3", "z")))
  }

  test("F1 ignore drops tombstones, F3 write keeps them") {
    val df = Seq(Some("v"), None, Some("w")).toDF("value")
    assert(RecordViews.applyNullBehavior(df, RecordViews.IgnoreNulls).count() == 2)
    assert(RecordViews.applyNullBehavior(df, RecordViews.WriteNulls).count() == 3)
  }

  test("F2 fail raises on the first tombstone (S3SinkTask.java:337-341)") {
    val df = Seq(Some("v"), None).toDF("value")
    intercept[Exception] {
      RecordViews.applyNullBehavior(df, RecordViews.FailOnNulls).collect()
    }
  }
}
