package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range joins — operators the reference's downstream consumers
  * need but Spark lacks as single primitives; composed from equi-join +
  * window dedup (SURVEY §2.8 mapping).
  */
object AsOf {

  /** As-of join: for each left row, the single right row with the greatest
    * `rightTs <= leftTs` within the same key. Tie-break on `rightTieBreak`
    * descending for determinism.
    *
    * Plan: equi-join on key (one shuffle, or broadcast if right is small)
    * + range predicate + row_number dedup. For sorted inputs at scale this
    * is the standard Spark formulation; a custom SparkPlan (merge-scan)
    * is the round-2 upgrade path. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, rightTieBreak: String,
               leftCols: Seq[String], rightCols: Seq[String]): DataFrame = {
    val l = left.select((key +: leftTs +: leftCols).distinct.map(c => col(c).as("l_" + c)): _*)
    val r = right.select((key +: rightTs +: rightCols).distinct.map(c => col(c).as("r_" + c)): _*)
    val joined = l.join(r,
      col("l_" + key) === col("r_" + key) &&
        col("r_" + rightTs) <= col("l_" + leftTs))
    val w = Window.partitionBy(leftCols.map(c => col("l_" + c)): _*)
      .orderBy(col("r_" + rightTs).desc, col("r_" + rightTieBreak).desc)
    joined.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(leftCols.map(c => col("l_" + c).as(c)) ++
        rightCols.map(c => col("r_" + c).as(c)): _*)
  }

  /** Range join: equi-key plus `rightTs` in (leftTs - before, leftTs]. */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
                leftTs: Column, rightTs: Column, before: Column): DataFrame =
    left.join(right, left(key) === right(key) &&
      rightTs > leftTs - before && rightTs <= leftTs)
}
