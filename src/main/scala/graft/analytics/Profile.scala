package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality summary pass a training pipeline
  * runs before ingesting a new corpus drop (the Deequ/dbt-test class of
  * check): per column null count, exact distinct count, min/max.
  *
  * Scale shape: ONE aggregate over ONE scan. The per-column distinct
  * counts expand inside a single aggregate (Spark plans multi-distinct
  * via Expand — rows × #distinct-cols intermediate, each slice partially
  * aggregated map-side), and min/max/null-counts ride the same pass; the
  * row-per-column layout then explodes the single result row driver-free.
  * No per-column jobs, no driver loop — profiling 100 TB costs one scan.
  */
object Profile {

  /** One row per profiled column: (column_name, null_count, n_distinct,
    * min_value, max_value) with min/max rendered as strings so columns of
    * any type share one schema (cast AFTER the typed min/max, so numeric
    * columns order numerically, not lexicographically).
    *
    * `approx = true` swaps the exact distinct counts for HLL++ sketches
    * (rsd 2%): the exact mode's Expand materializes rows × (#distinct
    * columns + 1) before aggregating — fine into the billions, but at
    * 100 TB × many columns the sketch path profiles in ONE non-expanded
    * pass with fixed-size partial state per column. */
  def summarize(df: DataFrame, cols: Seq[String],
                approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    // every name backtick-quoted: profiled columns are TOP-LEVEL names
    // (a name containing dots would otherwise parse as struct access,
    // both for the input column and for the generated aliases)
    def q(n: String) = col(s"`$n`")
    val aggs = cols.flatMap { c =>
      val distinct =
        if (approx) approx_count_distinct(q(c), 0.02).cast("long")
        else countDistinct(q(c)).cast("long")
      Seq(
        count(when(q(c).isNull, lit(1))).as(s"__${c}_nulls"),
        distinct.as(s"__${c}_distinct"),
        min(q(c)).cast("string").as(s"__${c}_min"),
        max(q(c)).cast("string").as(s"__${c}_max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("column_name"),
        q(s"__${c}_nulls").as("null_count"),
        q(s"__${c}_distinct").as("n_distinct"),
        q(s"__${c}_min").as("min_value"),
        q(s"__${c}_max").as("max_value"))
    }
    one.select(explode(array(entries: _*)).as("p")).select("p.*")
      .orderBy("column_name")
  }
}
