package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite the naive band-join predicate
  * `|leftExpr - rightExpr| <= delta` (which Spark can only plan as a
  * BroadcastNestedLoopJoin — O(|L|·|R|) at any scale) into the delta-bucket
  * equi-join `AsOf.bandJoin` builds by hand:
  *
  * {{{
  *   L JOIN R ON abs(l - r) <= d
  *     ==>
  *   π(origOutput) σ(abs(l - r) <= d)
  *     (explode(L, [⌊l/d⌋-1, ⌊l/d⌋, ⌊l/d⌋+1])  ⋈_{bucket}  R + ⌊r/d⌋)
  * }}}
  *
  * Any within-delta pair shares exactly one of the three bucket pairs, so
  * the equi-join is a duplicate-free superset and the original predicate
  * re-applies exactly. Users write the natural theta join (SQL or
  * DataFrame); the injected rule (`GraftExtensions` /
  * `BandJoinRewrite.install`) makes it scale.
  *
  * Deliberately narrow trigger: INNER join whose condition is exactly the
  * abs-band predicate over integral expressions, each side referencing
  * exactly one child. Anything else is left to Spark. The rewrite produces
  * an equi-join condition, so the rule never re-fires on its own output
  * (the residual abs-filter sits above the join, not in it). */
object BandJoinRewrite extends Rule[LogicalPlan] {

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner,
        Some(cond @ LessThanOrEqual(Abs(Subtract(a, b, _), _), Literal(d, dt))),
        hint)
        if (dt == LongType || dt == IntegerType) && integral(a) && integral(b) =>
      val delta = d match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.intValue().toLong
        case _ => -1L
      }
      // orient the two sides: each must reference exactly one child
      val oriented =
        if (a.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet)) Some((a, b))
        else if (b.references.subsetOf(left.outputSet) &&
          a.references.subsetOf(right.outputSet)) Some((b, a))
        else None
      if (delta <= 0 || oriented.isEmpty) j
      else {
        val (lTs, rTs) = oriented.get
        // bucket = floor-division in EXACT integer arithmetic (truncating
        // divide, corrected for negative remainders): double-space floor
        // would round operands above 2^53 — e.g. epoch-nanosecond longs —
        // and silently drop boundary pairs
        def bucket(e: Expression): Expression = {
          val el = Cast(e, LongType)
          val d = Literal(delta)
          val q = IntegralDivide(el, d)
          val r = Remainder(el, d)
          If(LessThan(r, Literal(0L)), Subtract(q, Literal(1L)), q)
        }
        val lb = bucket(lTs)
        val lBucket = AttributeReference("_graft_band_bucket", LongType)()
        val gen = Generate(
          Explode(CreateArray(Seq(
            Subtract(lb, Literal(1L)), lb, Add(lb, Literal(1L))))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(lBucket), child = left)
        val rBucket = Alias(bucket(rTs), "_graft_band_bucket_r")()
        val proj = Project(right.output :+ rBucket, right)
        val bucketJoin = Join(gen, proj, Inner,
          Some(EqualTo(lBucket, rBucket.toAttribute)), hint)
        Project(j.output, Filter(cond, bucketJoin))
      }
  }

  /** Idempotent live-session registration (config-time path:
    * `graft.functions.GraftExtensions` injects this rule). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(BandJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BandJoinRewrite
}
