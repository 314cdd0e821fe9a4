package graft

import graft.queries.RelationalQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Oracle-equivalence proof for the distributed Theil–Sen median tail
  * (r16 verdict #1): `RelationalQueries.theilSenMedian` (two-pass bucket
  * rank selection) must select EXACTLY the value the previous
  * single-window cumulative form selected — same n_pairs, same
  * mean-of-two-middles, same rounding — on every boundary shape:
  * odd/even pair counts, duplicate slopes straddling bucket edges,
  * single-slope types, negative slopes, and values far apart (sparse
  * buckets). The reference below IS the previous implementation,
  * verbatim. */
class TheilSenMedianSpec extends SparkSuite {

  /** The pre-r17 window-median tail, kept verbatim as the reference. */
  private def windowedReference(slopes: DataFrame): DataFrame = {
    val hist = slopes.groupBy(col("event_type"), col("sm"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(
        Window.partitionBy(col("event_type")).orderBy(col("sm"))))
      .withColumn("n", sum(col("c")).over(
        Window.partitionBy(col("event_type"))))
    hist.groupBy(col("event_type"))
      .agg(max(col("n")).cast("long").as("n_pairs"),
        round((
          min(when(col("cum") >= expr("(n + 1L) div 2L"), col("sm"))) +
          min(when(col("cum") >= expr("(n + 2L) div 2L"), col("sm"))))
          / 2.0, 1).as("slope_med_micro"))
      .orderBy(col("event_type"))
  }

  private def check(rows: Seq[(String, Long)], clue: String): Unit = {
    import spark.implicits._
    val slopes = rows.toDF("event_type", "sm")
    val got = RelationalQueries.theilSenMedian(slopes).collect().toSeq
    val want = windowedReference(slopes).collect().toSeq
    assert(got == want, s"$clue: got $got want $want")
    graft.analytics.Caches.clear()
  }

  test("odd and even pair counts") {
    check(Seq("a" -> 5L, "a" -> 1L, "a" -> 3L), "odd n: median = middle")
    check(Seq("a" -> 5L, "a" -> 1L, "a" -> 3L, "a" -> 9L),
      "even n: mean of two middles")
  }

  test("duplicate slopes and .5 rounding") {
    check(Seq("a" -> 2L, "a" -> 2L, "a" -> 2L, "a" -> 7L),
      "duplicates collapse in the histogram but keep multiplicity")
    check(Seq("a" -> 2L, "a" -> 3L), "two middles average to x.5")
  }

  test("single-slope type and single-row type") {
    check(Seq("a" -> 4L), "n=1: both ranks select the only value")
    check(Seq("a" -> 4L, "a" -> 4L, "b" -> -2L),
      "mn == mx within a type (bucket width degenerate to 1)")
  }

  test("negative slopes and wide sparse ranges") {
    check(Seq("a" -> -100L, "a" -> -7L, "a" -> 0L, "a" -> 3L,
      "a" -> 9000000000L), "negative + sparse far-apart values")
    check(Seq("a" -> -4503599627370496L, "a" -> 0L, "a" -> 4503599627370496L),
      "2^52-magnitude spread keeps bucket arithmetic in range")
  }

  test("duplicates straddling bucket edges at every rank position") {
    // 2050 values over a 4100-wide range -> ~2 distinct values/bucket at
    // 1024 buckets, with runs of duplicates crossing bucket boundaries.
    val vals = (0 until 2050).map(i => "a" -> (i / 2 * 4L))
    check(vals, "dense duplicate runs across bucket edges (even n)")
    check(vals :+ ("a" -> 4100L), "same with odd n")
    // multiple types at once, different shapes per type
    check(vals.take(301) ++ Seq("b" -> 1L, "b" -> 2L) ++
      (0 until 17).map(i => "c" -> (i * 1000000L - 8000000L)),
      "mixed types")
  }
}
