package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range joins — operators the reference's downstream consumers
  * need but Spark lacks as single primitives (SURVEY §2.8 mapping).
  */
object AsOf {

  /** As-of join: for each left row, the single right row with the greatest
    * `rightTs <= leftTs` within the same key. Ties on `rightTs` break by
    * the greatest `rightTieBreak`.
    *
    * Implementation is the LINEAR union formulation, not join+dedup: tag
    * both sides, sort once per key by (ts, side, tiebreak) with right rows
    * ordered before left rows at equal timestamps, and carry the most
    * recent right row forward with `last(..., ignoreNulls)`. One shuffle +
    * one sort, O(|L|+|R|) rows — a naive equi-join + row_number dedup
    * materializes every (left × preceding-right) pair first, which is
    * quadratic per key at scale. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, rightTieBreak: String,
               leftCols: Seq[String], rightCols: Seq[String]): DataFrame = {
    val rightPayload = struct((rightTs +: rightTieBreak +: rightCols)
      .distinct.map(col): _*)
    val l = left.select(
      col(key).as("_k"), col(leftTs).as("_ts"), lit(1).as("_side"),
      struct(leftCols.distinct.map(col): _*).as("_l"))
    val r = right.select(
      col(key).as("_k"), col(rightTs).as("_ts"), lit(0).as("_side"),
      rightPayload.as("_r"))
    // order: ts asc, right-before-left at equal ts (<= semantics), then
    // tiebreak asc so `last` picks the greatest
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"), col("_r").getField(rightTieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1 && col("_match").isNotNull)
      .select(leftCols.map(c => col("_l." + c).as(c)) ++
        rightCols.map(c => col("_match." + c).as(c)): _*)
  }

  /** Range join: equi-key plus `rightTs` in (leftTs - before, leftTs]. */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
                leftTs: Column, rightTs: Column, before: Column): DataFrame =
    left.join(right, left(key) === right(key) &&
      rightTs > leftTs - before && rightTs <= leftTs)
}
