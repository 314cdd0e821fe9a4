package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** The as-of join as a first-class Catalyst operator: logical node →
  * planner strategy → physical sort-merge execution, registered through
  * `SparkSessionExtensions` (`graft.functions.GraftExtensions`) or
  * `AsOfJoinStrategy.install` — the whole-operator extension tier for
  * semantics the built-in operators can't express as a single primitive.
  *
  * Semantics (same contract as `graft.analytics.AsOf.asofJoin` and the
  * DuckDB oracle): for each left row, the single right row with the
  * greatest `rightTs <= leftTs` in the same key group, ties on `rightTs`
  * broken by the greatest `tieBreak`; left rows without a match are
  * dropped (inner as-of). Null keys and null timestamps never match.
  *
  * Scale shape: EnsureRequirements clusters both children on the key
  * (`ClusteredDistribution`, co-partitioned exactly like a shuffled join)
  * and sorts them (left by key/ts, right by key/ts/tieBreak), then
  * `AsOfJoinExec` streams the two sorted iterators in one O(|L|+|R|) merge
  * pass per partition, carrying one buffered right row — no union
  * row-padding, no window-function frame buffering, no per-pair
  * materialization. This is the plan the union+`last(ignoreNulls)` window
  * formulation approximates with two extra projection layers; here it is
  * the physical operator itself.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression,
                        tieBreak: Expression)
    extends BinaryNode {
  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "as-of join needs matching non-empty key lists")
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tb) :: Nil
    case _ => Nil
  }

  /** Idempotent live-session registration (the config-time path is
    * `graft.functions.GraftExtensions`, which injects this strategy). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
}

/** Streaming sort-merge as-of join. Children arrive clustered on the key
  * and sorted (left: key, ts; right: key, ts, tieBreak), so each partition
  * is a single forward pass: advance the right cursor while its (key, ts)
  * is not past the current left row, remembering the last same-key row —
  * ascending order makes "last consumed" = "greatest (ts, tieBreak)". */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression,
                        tieBreak: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  // Same distribution contract as a shuffled equi-join: both children
  // clustered on their key expressions; EnsureRequirements co-partitions
  // them (compatible HashShuffleSpecs, same numPartitions).
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      Seq(SortOrder(rightTs, Ascending), SortOrder(tieBreak, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), left.output)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), right.output)
      val keyOrd =
        RowOrdering.createNaturalAscendingOrdering(leftKeys.map(_.dataType))
      val tsOrd =
        RowOrdering.createNaturalAscendingOrdering(Seq(leftTs.dataType))
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(output, output)

      new Iterator[InternalRow] {
        private var rCur: InternalRow =
          if (rIter.hasNext) rIter.next() else null
        // best same-key right row seen so far (copied — cursor rows reuse
        // their backing buffers) and a copy of its key for validity checks
        private var matchRow: InternalRow = _
        private var matchKey: UnsafeRow = _
        // `out` holds resultProj's reused buffer, so it must not be
        // recomputed until the consumer is done with the previous row:
        // advance lazily from hasNext/next, never eagerly after a yield
        private var out: InternalRow = _

        private def advance(): Unit = {
          out = null
          while (out == null && lIter.hasNext) {
            val l = lIter.next()
            val lKey = lKeyProj(l)
            if (!lKey.anyNull) {
              val lTs = lTsProj(l)
              if (!lTs.isNullAt(0)) {
                var scanning = rCur != null
                while (scanning) {
                  val rKey = rKeyProj(rCur)
                  val cmp = keyOrd.compare(rKey, lKey)
                  if (cmp < 0) {
                    // right row belongs to an already-passed key: discard
                    rCur = if (rIter.hasNext) rIter.next() else null
                    scanning = rCur != null
                  } else if (cmp == 0) {
                    val rTs = rTsProj(rCur)
                    if (!rTs.isNullAt(0) && tsOrd.compare(rTs, lTs) <= 0) {
                      matchRow = rCur.copy()
                      matchKey = rKey.copy().asInstanceOf[UnsafeRow]
                      rCur = if (rIter.hasNext) rIter.next() else null
                      scanning = rCur != null
                    } else if (rTs.isNullAt(0)) {
                      // null ts sorts first and never matches: discard
                      rCur = if (rIter.hasNext) rIter.next() else null
                      scanning = rCur != null
                    } else {
                      scanning = false // rTs > lTs: later lefts may want it
                    }
                  } else {
                    scanning = false // right cursor already past this key
                  }
                }
                if (matchKey != null && keyOrd.compare(matchKey, lKey) == 0) {
                  numOutputRows += 1
                  out = resultProj(joined(l, matchRow))
                }
              }
            }
          }
        }

        override def hasNext: Boolean = {
          if (out == null) advance()
          out != null
        }
        override def next(): InternalRow = {
          if (out == null) advance()
          val r = out
          out = null
          r
        }
      }
    }
  }
}

