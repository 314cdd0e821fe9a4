package graft.plans

import graft.{SparkSuite, Tables}
import graft.analytics.AsOf
import org.apache.spark.sql.functions._

/** Pins the native as-of operator (AsOfJoinPlan → AsOfJoinStrategy →
  * AsOfJoinExec) to the pure-DataFrame formulation's semantics, including
  * the edge cases the merge loop must get right: equal-timestamp ties,
  * tieBreak ordering, unmatched left rows, null keys, null timestamps,
  * and multi-row key groups spanning the right cursor. */
class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def native(l: org.apache.spark.sql.DataFrame,
                     r: org.apache.spark.sql.DataFrame) =
    AsOf.asofJoinNative(l, r, key = "k", leftTs = "lts", rightTs = "rts",
      rightTieBreak = "tb", leftCols = Seq("l_id"), rightCols = Seq("tb"))

  private def composed(l: org.apache.spark.sql.DataFrame,
                       r: org.apache.spark.sql.DataFrame) =
    AsOf.asofJoin(l, r, key = "k", leftTs = "lts", rightTs = "rts",
      rightTieBreak = "tb", leftCols = Seq("l_id"), rightCols = Seq("tb"))

  test("crafted edges: ties, tieBreak, no-match, null key, null ts") {
    val left = Seq(
      (Some("a"), Some(10L), 1L),  // matches rts=10 (<=, tie on ts)
      (Some("a"), Some(5L), 2L),   // matches rts=3
      (Some("a"), Some(2L), 3L),   // no right row <= 2 → dropped
      (Some("b"), Some(7L), 4L),   // matches the max-tb row at rts=7
      (Some("c"), Some(9L), 5L),   // key with no right rows → dropped
      (None, Some(9L), 6L),        // null key → dropped
      (Some("a"), None, 7L)        // null left ts → dropped
    ).toDF("k", "lts", "l_id")
    val right = Seq(
      (Some("a"), Some(3L), 30L),
      (Some("a"), Some(10L), 100L),
      (Some("a"), Some(12L), 120L), // future row, never matches
      (Some("b"), Some(7L), 71L),
      (Some("b"), Some(7L), 72L),   // same ts: tb=72 wins
      (Some("b"), None, 999L),      // null right ts never matches
      (None, Some(1L), 50L)         // null key never matches
    ).toDF("k", "rts", "tb")

    val got = native(left, right).as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L), (2L, 30L), (4L, 72L)))
    val ref = composed(left, right).as[(Long, Long)].collect().toSet
    assert(got == ref)
  }

  test("forward direction + tolerance (merge_asof knobs): nearest-next " +
    "match, greatest tiebreak on ties, tolerance gates the chosen match") {
    val left = Seq(
      (Some("a"), Some(10L), 1L),  // matches rts=10 (>=, tie on ts)
      (Some("a"), Some(4L), 2L),   // nearest next is rts=10; gap 6 > 5 → dropped by tolerance
      (Some("a"), Some(11L), 3L),  // matches rts=12
      (Some("b"), Some(6L), 4L),   // matches the max-tb row at rts=7
      (Some("a"), Some(13L), 5L)   // no right row >= 13 → dropped
    ).toDF("k", "lts", "l_id")
    val right = Seq(
      (Some("a"), Some(3L), 30L),   // past row, never matches forward
      (Some("a"), Some(10L), 100L),
      (Some("a"), Some(12L), 120L),
      (Some("b"), Some(7L), 71L),
      (Some("b"), Some(7L), 72L)    // same ts: tb=72 wins
    ).toDF("k", "rts", "tb")
    val got = AsOf.asofJoinDirected(left, right, "k", "lts", "rts", "tb",
      Seq("l_id"), Seq("tb"), forward = true, tolerance = Some(5.0))
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L), (3L, 120L), (4L, 72L)))
    // no tolerance: the gap-6 match for l_id=2 comes back
    val untol = AsOf.asofJoinDirected(left, right, "k", "lts", "rts", "tb",
      Seq("l_id"), Seq("tb"), forward = true)
      .as[(Long, Long)].collect().toSet
    assert(untol == Set((1L, 100L), (2L, 100L), (3L, 120L), (4L, 72L)))
  }

  test("differential vs the composed formulation on events at sf0.001") {
    val e = Tables.load(spark, sf0001, "events")
      .withColumn("ts", col("ts").cast("timestamp"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("k"), col("ts").as("lts"),
        col("event_id").as("l_id"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("k"), col("ts").as("rts"),
        col("event_id").as("tb"))
    val got = native(p, c).as[(Long, Long)].collect().toSet
    val ref = composed(p, c).as[(Long, Long)].collect().toSet
    assert(got.nonEmpty && got == ref)
  }

  test("randomized 3-way: native == composed == pure-Scala ground truth " +
    "(small key space forces ties, shared buckets, null edges)") {
    val rnd = new scala.util.Random(42)
    def mk(n: Int, idBase: Long) = (0 until n).map { i =>
      val k = if (rnd.nextInt(20) == 0) None else Some("k" + rnd.nextInt(8))
      val ts = if (rnd.nextInt(25) == 0) None else Some(rnd.nextInt(50).toLong)
      (k, ts, idBase + i)
    }
    val lRows = mk(1500, 0L)
    val rRows = mk(1500, 100000L)
    val left = lRows.toDF("k", "lts", "l_id")
    val right = rRows.toDF("k", "rts", "tb")

    // ground truth: greatest (rts, tb) with rts <= lts in the same key
    val truth = (for {
      (Some(lk), Some(lts), lId) <- lRows
      matches = rRows.collect {
        case (Some(rk), Some(rts), tb) if rk == lk && rts <= lts => (rts, tb)
      }
      if matches.nonEmpty
    } yield (lId, matches.max._2)).toSet

    val got = native(left, right).as[(Long, Long)].collect().toSet
    val ref = composed(left, right).as[(Long, Long)].collect().toSet
    assert(got == truth)
    assert(ref == truth)
  }

  test("plan: AsOfJoinExec with clustered children, no union/window") {
    val e = Tables.load(spark, sf0001, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("k"), col("ts").as("lts"),
        col("event_id").as("l_id"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("k"), col("ts").as("rts"),
        col("event_id").as("tb"))
    val df = native(p, c)
    df.collect() // force AQE to finalize the physical plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window"), "window formulation leaked in")
    assert(!plan.contains("Union"), "union formulation leaked in")
  }
}
