package graft.analytics

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSuite {
  import spark.implicits._

  test("summarize profiles nulls, distincts, and typed min/max per column") {
    val df = Seq(
      (Some(3), Some("b")), (None, Some("a")), (Some(100), None),
      (Some(3), Some("c")))
      .toDF("n", "s")
    val p = Profile.summarize(df, Seq("n", "s"))
      .as[(String, Long, Long, String, String)].collect().toSeq
    // numeric min/max order numerically BEFORE the string cast: max is
    // 100, not lexicographic "3"
    assert(p == Seq(
      ("n", 1L, 2L, "3", "100"),
      ("s", 1L, 3L, "a", "c")))
  }

  test("summarize handles column names containing dots (top-level names, " +
    "not struct paths)") {
    val df = Seq((1, "x"), (2, "y"), (2, null))
      .toDF("meta.n", "meta.s")
    val p = Profile.summarize(df, Seq("meta.n", "meta.s"))
      .as[(String, Long, Long, String, String)].collect().toSeq
    assert(p == Seq(
      ("meta.n", 0L, 2L, "1", "2"),
      ("meta.s", 1L, 2L, "x", "y")))
  }

  test("summarize is one job over one scan (no per-column actions)") {
    val df = Seq((1, "a"), (2, "b")).toDF("n", "s")
    val plan = Profile.summarize(df, Seq("n", "s"))
      .queryExecution.executedPlan.toString
    // a single aggregate subtree: the multi-distinct rewrites to Expand,
    // never to N separate scans unioned together
    assert(!plan.contains("Union"), plan)
  }

  test("approx mode profiles without the Expand (the 100 TB path) and " +
    "its distinct estimates land within HLL tolerance of exact") {
    val df = (0 until 2000).map(i => (i.toLong, s"s${i % 37}"))
      .toDF("n", "s")
    val plan = Profile.summarize(df, Seq("n", "s"), approx = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
    val got = Profile.summarize(df, Seq("n", "s"), approx = true)
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(math.abs(got("n") - 2000L) <= 100, got)
    assert(math.abs(got("s") - 37L) <= 3, got)
  }

  test("ngrams keep multiplicity, truncate short docs to one gram, and " +
    "null-propagate on null text (explode then emits no rows, matching " +
    "the oracle's unnest)") {
    val df = Seq(Some("a b a b"), Some("solo"), Some("x y"), None)
      .toDF("text")
    val r = df.select(TextAnalysis.ngrams(col("text"), 2).as("g"))
      .as[Option[Seq[String]]].collect().toSeq
    assert(r == Seq(
      Some(Seq("a b", "b a", "a b")), Some(Seq("solo")), Some(Seq("x y")),
      None))
  }
}
