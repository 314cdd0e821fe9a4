package graft.plans

import graft.{SparkSuite, Tables}
import graft.analytics.AsOf
import org.apache.spark.sql.functions._

/** The injected optimizer rule turns the naive |l-r| <= d theta join into
  * the delta-bucket equi-join: same rows, no nested-loop plan. */
class BandJoinRewriteSpec extends SparkSuite {
  import spark.implicits._

  private lazy val events = {
    BandJoinRewrite.install(spark)
    Tables.load(spark, sf0001, "events")
      .withColumn("ts", col("ts").cast("timestamp")).cache()
  }

  private def sides = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("ts").as("p_ts"), col("event_id").as("p_event"))
    val c = events.filter(col("event_type") === "click")
      .select(col("ts").as("c_ts"), col("event_id").as("c_event"))
    (p, c)
  }

  test("naive abs-band theta join rewrites to a bucket equi-join and " +
    "matches the hand-built bandJoin rows") {
    val (p, c) = sides
    // ±10 min: wide enough that sf0.001's sparse events produce pairs
    val delta = 600000000L
    val naive = p.join(c,
      abs(unix_micros(col("p_ts")) - unix_micros(col("c_ts")))
        <= lit(delta))
    naive.collect() // finalize under AQE before reading the plan
    val plan = naive.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("_graft_band_bucket"), plan)

    val got = naive.select("p_event", "c_event")
      .as[(Long, Long)].collect().toSet
    val ref = AsOf.bandJoin(p, c, col("p_ts"), col("c_ts"), delta)
      .select("p_event", "c_event").as[(Long, Long)].collect().toSet
    assert(got.nonEmpty && got == ref)
  }

  test("exact above 2^53: nano-epoch longs keep boundary pairs the old " +
    "double-space floor would round away") {
    BandJoinRewrite.install(spark)
    // 1.7e18-scale values; the pair at exactly |a-b| = d must survive
    val base = 1700000000000000000L
    val d = 5000000000L // 5s in nanos
    val p = Seq((1L, base), (2L, base + 7 * d))
      .toDF("p_event", "p_ns")
    val c = Seq((10L, base + d), (11L, base - d), (12L, base + 2 * d + 1))
      .toDF("c_event", "c_ns")
    val got = p.join(c, abs(col("p_ns") - col("c_ns")) <= lit(d))
      .select("p_event", "c_event").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (1L, 11L)), s"got $got")
  }

  test("non-matching joins are untouched (equi-join keeps its plan)") {
    val (p, c) = sides
    val equi = p.join(c, unix_micros(col("p_ts")) === unix_micros(col("c_ts")))
    val plan = equi.queryExecution.optimizedPlan.toString
    assert(!plan.contains("_graft_band_bucket"), plan)
  }
}
