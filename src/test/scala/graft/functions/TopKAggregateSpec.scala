package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKAggregateSpec extends SparkSuite {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().sorted.toSeq
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("q_id"))
      .agg(HashExpressions.topKByScore(col("sim"), col("n_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), col("t.id").as("n_id"), col("t.score").as("sim"),
        (col("pos") + 1).as("rank"))
      .as[(Long, Long, Double, Int)].collect().sorted.toSeq

  test("topKByScore equals the row_number window on a random frame with " +
    "engineered score ties (the drop-in contract)") {
    // 40 groups x 400 candidates; sims snap to 2 decimals so ties are
    // dense and the n_id tie-break actually decides ranks
    val r = new scala.util.Random(7)
    val rows = for (q <- 0L until 40L; n <- 0L until 400L)
      yield (q, n, math.rint(r.nextDouble() * 100) / 100)
    val df = rows.toDF("q_id", "n_id", "sim").repartition(13)
    assert(aggTopK(df, 10) == windowTopK(df, 10))
  }

  test("topKByScore survives buffer overflow compaction: groups far " +
    "larger than the 4k buffer keep the exact top-k") {
    // one group with 5000 candidates vs k=4 -> the 16-slot buffer
    // compacts hundreds of times; the best rows arrive LAST so the
    // threshold reject must keep admitting improvements
    val rows = (0L until 5000L).map(n => (1L, n, n.toDouble / 100.0))
    val df = rows.toDF("q_id", "n_id", "sim").repartition(7)
    val got = aggTopK(df, 4)
    assert(got == windowTopK(df, 4))
    assert(got.sortBy(_._4).map(_._2) == Seq(4999L, 4998L, 4997L, 4996L),
      got)
  }

  test("topKByScore with k larger than the group returns the whole " +
    "group, sorted") {
    val df = Seq((1L, 3L, 0.5), (1L, 1L, 0.9), (1L, 2L, 0.5))
      .toDF("q_id", "n_id", "sim")
    assert(aggTopK(df, 10) ==
      Seq((1L, 1L, 0.9, 1), (1L, 2L, 0.5, 2), (1L, 3L, 0.5, 3)))
  }

  test("topKByScore orders NaN greatest — Spark's descending-double " +
    "window semantics, preserved through partial merge") {
    val df = Seq((1L, 5L, 0.3), (1L, 6L, Double.NaN), (1L, 7L, 0.9))
      .toDF("q_id", "n_id", "sim").repartition(3)
    // NaN != NaN under ==, so compare via raw bits
    def canon(rs: Seq[(Long, Long, Double, Int)]) =
      rs.map(t => (t._1, t._2, java.lang.Double.doubleToLongBits(t._3), t._4))
    assert(canon(aggTopK(df, 2)) == canon(windowTopK(df, 2)))
    assert(aggTopK(df, 2).minBy(_._4)._2 == 6L, "NaN row must rank first")
  }

  test("topKByScore partial aggregation: the physical plan carries a " +
    "partial_topk_by_score before the exchange (map-side combine)") {
    val df = (0L until 100L).map(n => (n % 5, n, n.toDouble))
      .toDF("q_id", "n_id", "sim")
    val p = df.groupBy(col("q_id"))
      .agg(HashExpressions.topKByScore(col("sim"), col("n_id"), 3).as("t"))
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_topk_by_score"),
      s"no map-side partial topk in plan:\n$p")
  }
}
