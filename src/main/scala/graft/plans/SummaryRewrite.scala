package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}
import org.apache.spark.sql.types._

/** Materialized summary-table rewrite — the aggregate-serving half of a
  * lakehouse: dashboard aggregates over a 100 TB base table answer from a
  * pre-aggregated summary (one row per dimension combination) instead of
  * re-scanning the lake, transparently, via an injected optimizer rule.
  *
  * A summary registered with [[register]] declares: THIS parquet directory
  * holds, for base table B, one row per distinct `dims` tuple carrying the
  * rollup-algebra partials for `measures` ([[buildSummary]]'s schema —
  * `m_count`, and per measure x: `m_sum_x` / `m_cnt_x` / `m_min_x` /
  * `m_max_x`). The rule then rewrites any
  *
  * {{{ Aggregate over [attr-only Project / Filter]* over scan(B) }}}
  *
  * whose grouping expressions and filters reference ONLY dims and whose
  * aggregates are derivable from the partials, into the same aggregate
  * over the summary scan. Everything else is left untouched — the rule is
  * deliberately narrow and every translation is EXACT by rollup algebra
  * (never approximate):
  *
  *  - `sum(x)`      → `sum(m_sum_x)` — re-adding subtotals in the same
  *    accumulator type Spark's own partial aggregation uses, so integral
  *    sums are bit-exact and ANSI overflow fires iff the base would;
  *  - `count(*)`    → `coalesce(sum(m_count), 0)`;
  *  - `count(e…)`   → `coalesce(sum(if(e… not null, m_count, 0)), 0)` for
  *    dim-valued e (a dim is CONSTANT within a summary group, so its
  *    null-ness is decidable per summary row); `count(x)` for a measure →
  *    `coalesce(sum(m_cnt_x), 0)`;
  *  - `count(distinct d…)` over dims → itself on the summary (the summary
  *    preserves the distinct dim tuples exactly);
  *  - `min/max(x|d)` → `min/max(m_min_x / m_max_x / d)` (min of group
  *    minima);
  *  - `avg(x)` for INTEGRAL x → `sum(double(m_sum_x)) / sum(m_cnt_x)`
  *    (LEGACY divide — null on empty, like Average). The numerator
  *    refolds in DOUBLE, the base Average's own accumulator type — a
  *    long refold could overflow at 2^63 where the base's double buffer
  *    cannot. Exact: integral partials are integer-exact in double
  *    below 2^53, so the division input equals the base's accumulated
  *    sum bit-for-bit (and past 2^53 the base's partial-merge order is
  *    itself nondeterministic, so there is no stricter target to miss).
  *    Double measures stay on the base scan — their per-row addition
  *    order is observable at any magnitude;
  *  - `FILTER (WHERE p)` aggregate clauses translate when p references
  *    only dims (constant per summary row — whole groups pass or fail,
  *    exactly as they would row-by-row on the base);
  *  - grouping by ANY expression over dims (e.g. `year(day)`) is exact
  *    because the summary grain partitions finer than the re-grouping.
  *
  * Beyond the flat GROUP BY, the same registry serves three more plan
  * SHAPES — grouping sets (rollup/cube: the `Expand` re-bases on summary
  * rows, [[rewriteExpand]]), star joins (base JOIN dim: only the base
  * side swaps, [[tryRewriteStar]]), and SQL views / HAVING / ORDER BY /
  * LIMIT above the aggregate (untouched by construction) — and two more
  * summary KINDS beside the rollup partials: the HISTOGRAM kind
  * ((dims, value)→count, [[registerHist]]) serving exact
  * percentiles/medians and distinct-measure counts, and the explicit
  * sketch summaries ([[buildHllSummary]] approx-distinct registers,
  * `Sketches.cmCellsBy` heavy-hitter cells) whose grain-refolds are
  * bit-equal to direct builds by their merge monoids (idempotent max /
  * linear sum). Maintenance is first-class: streaming delta slices
  * (`StreamingIngest.startSummarySink`), group-scoped incremental
  * refresh under MERGE INTO ([[refreshOnUpsert]]), a parquet catalog
  * ([[save]]/[[load]]), the [[stale]] fingerprint tripwire, and the
  * [[explainServing]] diagnostic.
  *
  * NOT rewritten (left to the base scan, by design): `avg` over DOUBLE
  * or DECIMAL measures (addition order is observable for doubles;
  * decimal Average carries widened internal precision) and `avg(DISTINCT …)`,
  * distinct aggregates over measures without a histogram, decimal sums
  * (Sum widens precision per level, so the re-aggregated type diverges —
  * caught by the type guard), outer joins that do not preserve the base
  * side, and any plan whose filters or groupings touch a non-dim.
  *
  * Freshness is the registration's contract: [[register]] promises the
  * summary reflects the base as of now — the streaming face
  * (`StreamingIngest.startSummarySink`) maintains delta slices per
  * micro-batch exactly-once, and [[mergeSummaries]] folds slices into
  * servable form (the partials are a commutative monoid, so slice merge
  * is the same algebra as the rewrite itself).
  *
  * Scale: this is the highest-leverage rewrite in the engine — a grouped
  * aggregate that would scan 100 TB answers from a summary of
  * |dim-combination| rows (typically MBs), a 10⁴–10⁶× scan reduction,
  * with filters on dims pushed into the summary's parquet scan and the
  * summary scan column-pruned to exactly the partials the query needs.
  *
  * Reference frame: kafka-connect-storage-cloud lands the raw lake
  * (TopicPartitionWriter.java) and leaves serving to the warehouse; this
  * closes the loop Spark-side the way Calcite/Materialize-style
  * materialized-view rewrites do, restricted to the rollup algebra where
  * exactness is provable.
  */
object SummaryRewrite extends Rule[LogicalPlan] {

  /** One registered summary: the base scan's root paths, the declared
    * dims/measures, and the ANALYZED summary scan plan (re-instanced with
    * fresh expression ids at every rewrite, so one summary can serve
    * several aggregates inside a single query). `hist = Some(m)` marks
    * the HISTOGRAM kind ([[buildHistSummary]]): grain (dims…, v=m) with
    * a `cnt` frequency — the kind that can serve exact percentiles and
    * distinct-measure counts, which the rollup kind must decline. */
  private final case class SummaryDef(dims: Seq[String],
                                      measures: Set[String],
                                      hist: Option[String],
                                      summaryPlan: LogicalPlan,
                                      baseRoots: Seq[String],
                                      summaryRoots: Seq[String],
                                      baseFp: String)

  private val registry = new ConcurrentHashMap[String, Vector[SummaryDef]]

  private def rawRoots(plan: LogicalPlan): Option[Seq[String]] = plan match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        Some(fs.location.rootPaths.map(_.toString).sorted)
      case _ => None
    }
    case _ => None
  }

  private def rootsOf(plan: LogicalPlan): Option[String] =
    rawRoots(plan).map(_.mkString(" "))

  /** Content fingerprint of local base roots (file list + sizes +
    * mtimes); empty for non-local schemes -- [[stale]] then cannot vouch
    * for those registrations and skips them. */
  private def fpOf(roots: Seq[String]): String =
    try roots.sorted.map { r =>
      val local =
        if (r.startsWith("file:")) new java.net.URI(r).getPath else r
      graft.analytics.Similarity.dataFingerprint(local)
    }.mkString("+")
    catch { case _: Exception => "" }

  /** Register `summary` (built by [[buildSummary]] over `base`, then
    * typically round-tripped through parquet) as servable for aggregates
    * over `base`. Re-registration for the same base REPLACES summaries
    * with the same dims (refresh) and keeps others (several grains may
    * coexist; the rewrite picks the coarsest that satisfies the query).
    * Both frames must be plain file scans. */
  def register(base: DataFrame, summary: DataFrame, dims: Seq[String],
               measures: Seq[String]): Unit =
    registerWithFp(base, summary, dims, measures, savedFp = None)

  /** `savedFp = Some(fp)` restores a persisted fingerprint verbatim
    * ([[load]]): recomputing fpOf() here would silently re-baseline a
    * base that mutated between save and load, muting the [[stale]]
    * tripwire exactly when it should fire. */
  private def registerWithFp(base: DataFrame, summary: DataFrame,
                             dims: Seq[String], measures: Seq[String],
                             savedFp: Option[String]): Unit = {
    val basePlan = org.apache.spark.sql.graft.bridge.analyzed(base)
    val bRoots = rawRoots(basePlan)
      .getOrElse(throw new IllegalArgumentException(
        "summary rewrite: base must be a plain file scan"))
    val sumPlan = org.apache.spark.sql.graft.bridge.analyzed(summary)
    val sRoots = rawRoots(sumPlan).getOrElse(
      throw new IllegalArgumentException(
        "summary rewrite: summary must be a plain file scan"))
    val have = sumPlan.output.map(_.name).toSet
    val need = dims ++ Seq("m_count") ++ measures.flatMap(m =>
      Seq(s"m_sum_$m", s"m_cnt_$m", s"m_min_$m", s"m_max_$m"))
    require(need.forall(have), s"summary rewrite: summary is missing " +
      s"columns ${need.filterNot(have).mkString(", ")}")
    val def_ = SummaryDef(dims, measures.toSet, None, sumPlan,
      bRoots, sRoots, savedFp.getOrElse(fpOf(bRoots)))
    registry.compute(bRoots.mkString(" "), (_, old) =>
      Option(old).getOrElse(Vector.empty)
        .filterNot(d => d.hist.isEmpty && d.dims.toSet == dims.toSet)
        :+ def_)
  }

  /** Register a HISTOGRAM summary (built by [[buildHistSummary]]) of
    * base measure `measure` at `dims` grain: one row per distinct
    * (dims…, value) with its row count. Serves everything the rollup
    * kind serves for that measure PLUS exact `percentile`/`median`
    * (Spark's frequency-weighted `Percentile` reaches the identical
    * buffer state, so results are bit-exact) and exact
    * `count(DISTINCT measure)` (distinct values survive the grain).
    * `sum(measure)` translates as Σ v·cnt for integral v only — exact
    * integer arithmetic; a double's per-row addition order would not
    * reproduce. Re-registration replaces the same (dims, measure) hist. */
  def registerHist(base: DataFrame, hist: DataFrame, dims: Seq[String],
                   measure: String): Unit =
    registerHistWithFp(base, hist, dims, measure, savedFp = None)

  private def registerHistWithFp(base: DataFrame, hist: DataFrame,
                                 dims: Seq[String], measure: String,
                                 savedFp: Option[String]): Unit = {
    val basePlan = org.apache.spark.sql.graft.bridge.analyzed(base)
    val bRoots = rawRoots(basePlan)
      .getOrElse(throw new IllegalArgumentException(
        "summary rewrite: base must be a plain file scan"))
    val histPlan = org.apache.spark.sql.graft.bridge.analyzed(hist)
    val sRoots = rawRoots(histPlan).getOrElse(
      throw new IllegalArgumentException(
        "summary rewrite: hist summary must be a plain file scan"))
    val have = histPlan.output.map(_.name).toSet
    require((dims ++ Seq("v", "cnt")).forall(have),
      "summary rewrite: hist summary must carry dims, v, cnt")
    val def_ = SummaryDef(dims, Set(measure), Some(measure), histPlan,
      bRoots, sRoots, savedFp.getOrElse(fpOf(bRoots)))
    registry.compute(bRoots.mkString(" "), (_, old) =>
      Option(old).getOrElse(Vector.empty)
        .filterNot(d => d.hist.contains(measure) && d.dims.toSet == dims.toSet)
        :+ def_)
  }

  /** Drop every registration (specs; also frees the analyzed plans). */
  def clear(): Unit = registry.clear()

  /** Persist the current registrations as a CATALOG (a parquet table of
    * paths + grains, the engine's own format — no sidecar formats): a
    * new session calls [[load]] to re-register everything, which is how
    * the serving layer survives driver restarts. Model-scale data:
    * one row per registration. */
  def save(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val rows = registry.values.asScala.flatten.map(d =>
      (d.baseRoots, d.summaryRoots, d.dims, d.measures.toSeq.sorted,
        d.hist, d.baseFp)).toSeq
    import spark.implicits._
    rows.toDF("base_roots", "summary_roots", "dims", "measures", "hist",
        "base_fp")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Re-register every catalog row saved by [[save]] (ADDITIVE — same
    * replace-by-grain semantics as live registration). The base content
    * may have moved on since the save; [[stale]] reports which
    * registrations no longer match their recorded base fingerprint. */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Unit =
    spark.read.parquet(dir)
      .select(col("base_roots"), col("summary_roots"), col("dims"),
        col("measures"), col("hist"), col("base_fp"))
      .collect().foreach { r =>
        val base = spark.read.parquet(r.getSeq[String](0): _*)
        val summ = spark.read.parquet(r.getSeq[String](1): _*)
        val dims = r.getSeq[String](2)
        // restore the SAVED fingerprint — if the base mutated between
        // save and load, stale() must still fire
        val fp = Some(if (r.isNullAt(5)) "" else r.getString(5))
        if (r.isNullAt(4))
          registerWithFp(base, summ, dims, r.getSeq[String](3), fp)
        else registerHistWithFp(base, summ, dims, r.getString(4), fp)
      }

  /** Registrations whose base content no longer matches the fingerprint
    * captured at registration time — the freshness tripwire an operator
    * runs before trusting served dashboards after an unplanned write to
    * the lake. Local (file:) roots only; non-local registrations carry
    * no fingerprint and are never reported. Returns
    * (baseRoots, dims, histMeasure) per stale registration. */
  def stale(): Seq[(Seq[String], Seq[String], Option[String])] = {
    import scala.jdk.CollectionConverters._
    registry.values.asScala.flatten.toSeq
      .filter(d => d.baseFp.nonEmpty && fpOf(d.baseRoots) != d.baseFp)
      .map(d => (d.baseRoots, d.dims, d.hist))
  }

  /** Build the rollup-algebra summary of `base` at `dims` grain: the
    * frame to persist and [[register]]. One corpus-scale aggregate —
    * partial-aggregatable, so at 100 TB it is one shuffle of
    * |dim-combination| rows per mapper. */
  def buildSummary(base: DataFrame, dims: Seq[String],
                   measures: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).cast("long").as("m_count") +:
      measures.flatMap { m =>
        Seq(sum(col(m)).as(s"m_sum_$m"),
          count(col(m)).cast("long").as(s"m_cnt_$m"),
          min(col(m)).as(s"m_min_$m"),
          max(col(m)).as(s"m_max_$m"))
      }
    base.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Build the histogram summary of `base` for one `measure` at `dims`
    * grain: one row per distinct (dims…, value) with its frequency —
    * the q71–q74 histogram-grain discipline as a SERVABLE table. Null
    * measure values keep a row (cnt of the null group), so count(*)
    * stays derivable. Size is |dims × distinct values| — value-grain,
    * never lake-grain; slices merge with [[mergeHistSummaries]]. */
  def buildHistSummary(base: DataFrame, dims: Seq[String],
                       measure: String): DataFrame =
    base.groupBy((dims.map(col) :+ col(measure).as("v")): _*)
      .agg(count(lit(1)).cast("long").as("cnt"))

  /** Fold histogram-summary slices: frequencies add at (dims…, v) grain. */
  def mergeHistSummaries(slices: DataFrame, dims: Seq[String]): DataFrame =
    slices.groupBy((dims.map(col) :+ col("v")): _*)
      .agg(sum(col("cnt")).cast("long").as("cnt"))

  /** HLL REGISTER summary — approximate-distinct serving (the DAU/MAU
    * pattern): one row per (dims…, bucket) carrying the max rank of the
    * engine-portable 60-bit hash (`Sketches.hllBucketRho`, the
    * `profile_hll_distinct` construction — oracle-checked bit-for-bit).
    * Register max is an idempotent commutative monoid, so [[serveHll]]
    * at ANY coarser grain equals a direct build at that grain exactly —
    * one 2^p-register table answers distinct-user counts for every
    * rollup of its dims, at ~1.04/√2^p relative error (4.6% at p=9).
    * Served EXPLICITLY (not via the transparent rule): an estimate is
    * not the exact count(DISTINCT x) the rule promises to preserve. */
  def buildHllSummary(base: DataFrame, dims: Seq[String], item: Column,
                      p: Int = 9): DataFrame =
    base.filter(item.isNotNull)
      .select((dims.map(col) :+
        graft.analytics.Sketches.hllBucketRho(item, p).as("br")): _*)
      .groupBy((dims.map(col) :+ col("br.bkt").as("bkt")): _*)
      .agg(max(col("br.rho")).as("mr"))

  /** Fold HLL-summary slices: max per (dims…, bucket). Idempotent —
    * overlapping slices are safe (unlike CM cells). */
  def mergeHllSummaries(slices: DataFrame, dims: Seq[String]): DataFrame =
    slices.groupBy((dims.map(col) :+ col("bkt")): _*)
      .agg(max(col("mr")).as("mr"))

  /** Distinct-count estimates from a register summary at `dims` grain —
    * any SUBSET of the build dims (register max re-folds exactly). The
    * estimate chain is `Sketches.hllFromRegisters` generalized to
    * multi-column groups: exact-integer harmonic sum, one double
    * division, the linear-counting switch from a precomputed table. */
  def serveHll(hll: DataFrame, dims: Seq[String], p: Int = 9): DataFrame = {
    val m = 1 << p
    val maxRank = 60 - p + 1
    val pow2Max = 1L << maxRank
    val lcTable = graft.analytics.Sketches.hllLcTable(p)
    mergeHllSummaries(hll, dims)
      .groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("nb"),
        sum(org.apache.spark.sql.functions.expr(
          s"shiftleft(CAST(1 AS BIGINT), $maxRank - mr)")).as("sp"))
      .withColumn("v", lit(m.toLong) - col("nb"))
      .withColumn("s", col("v") * lit(pow2Max) + col("sp"))
      .withColumn("raw",
        org.apache.spark.sql.functions.round(
          lit(graft.analytics.Sketches.hllNum(p)) / col("s").cast("double"),
          0).cast("long"))
      .select((dims.map(col) :+
        org.apache.spark.sql.functions.when(
            col("v") > 0 && col("raw") <= lit(5L * m / 2),
            org.apache.spark.sql.functions.element_at(
              lit(lcTable.toArray), col("v").cast("int")))
          .otherwise(col("raw")).as("est_distinct")): _*)
  }

  /** Incremental view maintenance under MERGE INTO: refresh only the
    * summary groups an upsert TOUCHES, never the whole lake. A pure
    * delta-add cannot maintain min/max (or counts) once rows are
    * REPLACED — the classic IVM answer is group-scoped recompute:
    *
    *  1. touched = dim tuples of the update batch ∪ dim tuples of the
    *     OLD rows holding updated keys (an update may MOVE a row across
    *     groups — both its old and new group need recomputing);
    *  2. untouched groups keep their partials verbatim (anti-join);
    *  3. touched groups recompute from the post-merge base restricted
    *     to those dims (semi-join — with a dim-partitioned lake this is
    *     partition-pruned to the touched slices).
    *
    * Dim joins are NULL-SAFE (`<=>`): a null dim is a real group.
    * Returns the refreshed summary, exactly equal to
    * `buildSummary(newBase, dims, measures)` ([[SummaryRewriteSpec]]
    * pins the equality after a cross-group upsert). Scale: step 1 is
    * update-batch-sized plus one semi-join against the OLD base on
    * keys; step 3 scans only touched groups — the refresh cost tracks
    * the update, not the lake. */
  def refreshOnUpsert(oldBase: DataFrame, newBase: DataFrame,
                      updates: DataFrame, keyCols: Seq[String],
                      oldSummary: DataFrame, dims: Seq[String],
                      measures: Seq[String]): DataFrame = {
    def keyCond(l: DataFrame, r: DataFrame) =
      keyCols.map(k => l(k) <=> r(k)).reduce(_ && _)
    def dimCond(l: DataFrame, r: DataFrame) =
      dims.map(c => l(c) <=> r(c)).reduce(_ && _)
    val updKeys = updates.select(keyCols.map(col): _*).distinct()
    val touched = oldBase
      .join(updKeys, keyCond(oldBase, updKeys), "left_semi")
      .select(dims.map(col): _*)
      .unionByName(updates.select(dims.map(col): _*))
      .distinct()
    val kept = oldSummary
      .join(touched, dimCond(oldSummary, touched), "left_anti")
    val recomputed = buildSummary(
      newBase.join(touched, dimCond(newBase, touched), "left_semi"),
      dims, measures)
    kept.unionByName(recomputed)
  }

  /** Fold summary SLICES (e.g. one [[buildSummary]] delta per streaming
    * micro-batch) into one servable summary: the partials form a
    * commutative monoid — counts and sums add, minima min, maxima max —
    * so slice merge is exact regardless of how rows were split. */
  def mergeSummaries(slices: DataFrame, dims: Seq[String],
                     measures: Seq[String]): DataFrame = {
    val aggs = sum(col("m_count")).cast("long").as("m_count") +:
      measures.flatMap { m =>
        Seq(sum(col(s"m_sum_$m")).as(s"m_sum_$m"),
          sum(col(s"m_cnt_$m")).cast("long").as(s"m_cnt_$m"),
          min(col(s"m_min_$m")).as(s"m_min_$m"),
          max(col(s"m_max_$m")).as(s"m_max_$m"))
      }
    slices.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  // ---------------------------------------------------------------------
  // the rule
  // ---------------------------------------------------------------------

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

  /** Collect the Project/Filter stack between an Aggregate and its scan —
    * the shapes the optimizer leaves there (pruning projects, pushed-down
    * filters, and `PullOutGroupingExpressions`' alias project) — with
    * filters and project aliases re-expressed over the RELATION's own
    * attributes (`PhysicalOperation` inlines aliases as it walks). */
  private def stem(p: LogicalPlan): Option[(Seq[Expression], LogicalPlan,
      Map[ExprId, Expression])] = p match {
    case org.apache.spark.sql.catalyst.planning.PhysicalOperation(
        projects, filters, lr: LogicalRelation) =>
      Some((filters, lr,
        projects.collect { case a: Alias => a.exprId -> a.child }.toMap))
    case _ => None
  }

  /** Star-join context: the aggregate sits over `join`, the registered
    * base is the `baseIsLeft` side, `aboveConds` were collected between
    * the Aggregate and the Join (they may reference both sides), and the
    * OTHER side of the join is kept verbatim. */
  private final case class StarJoin(join: Join, baseIsLeft: Boolean,
                                    aboveConds: Seq[Expression])

  private def sorted(cands: Vector[SummaryDef]): Vector[SummaryDef] =
    // coarsest grain first (fewest dims = smallest scan); rollup kind
    // before hist kind at the same grain (hist is value-grain, bigger)
    cands.sortBy(c => (c.dims.size, c.hist.isDefined, c.dims.mkString(",")))

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    // grouping sets (rollup/cube) analyze to Aggregate-over-Expand; the
    // stem sits below the Expand there
    val (stemPlan, expandOpt) = agg.child match {
      case e: Expand => (e.child, Some(e))
      case c => (c, None)
    }
    stem(stemPlan) match {
      case Some((conds, baseRel, aliases)) =>
        for {
          key <- rootsOf(baseRel)
          candidates <- Option(registry.get(key))
          rewritten <- sorted(candidates).iterator.map { c =>
            expandOpt match {
              case Some(e) => rewriteExpand(agg, e, conds, aliases, c)
              case None =>
                rewriteWith(agg, conds, aliases, c, baseRel, None)
            }
          }.collectFirst { case Some(p) => p }
        } yield rewritten
      case None if expandOpt.isEmpty => tryRewriteStar(agg, stemPlan)
      case None => None
    }
  }

  /** Star-schema flavor: Aggregate over (base JOIN anything). The base
    * side swaps to its summary; the other side, the join structure, and
    * every expression over the other side stay verbatim. Exactness is
    * the same multiplicity algebra — each summary row joins exactly like
    * the m_count base rows it stands for would (the join condition
    * references only base DIMS, which are constant across those rows),
    * so count(*) = Σ m_count over join rows, sums/mins/maxes fold the
    * same partials, and distinct tuples over dims + other-side columns
    * are preserved. Join types where the BASE is the outer-preserved
    * side only: an unmatched OTHER-side row would surface once on the
    * base scan but carries no m_count on the summary scan. */
  private def tryRewriteStar(agg: Aggregate, stemPlan: LogicalPlan)
      : Option[LogicalPlan] = stemPlan match {
    case org.apache.spark.sql.catalyst.planning.PhysicalOperation(
        projects, above, j @ Join(l, r, jt, _, _))
        if jt == org.apache.spark.sql.catalyst.plans.Inner ||
          jt == org.apache.spark.sql.catalyst.plans.LeftOuter ||
          jt == org.apache.spark.sql.catalyst.plans.RightOuter =>
      val aboveAliases =
        projects.collect { case a: Alias => a.exprId -> a.child }.toMap
      def trySide(baseIsLeft: Boolean): Option[LogicalPlan] = {
        val okType = jt match {
          case org.apache.spark.sql.catalyst.plans.Inner => true
          case org.apache.spark.sql.catalyst.plans.LeftOuter => baseIsLeft
          case org.apache.spark.sql.catalyst.plans.RightOuter => !baseIsLeft
          case _ => false
        }
        if (!okType) None
        else for {
          (baseConds, baseRel, stemAliases) <-
            stem(if (baseIsLeft) l else r)
          key <- rootsOf(baseRel)
          candidates <- Option(registry.get(key))
          rewritten <- sorted(candidates).iterator.map(c =>
            rewriteWith(agg, baseConds, aboveAliases ++ stemAliases, c,
              baseRel, Some(StarJoin(j, baseIsLeft, above))))
            .collectFirst { case Some(p) => p }
        } yield rewritten
      }
      trySide(baseIsLeft = true).orElse(trySide(baseIsLeft = false))
    case _ => None
  }

  /** Grouping-sets flavor (rollup/cube dashboards): the analyzer plans
    * them as `Aggregate over Expand`, where each Expand projection is one
    * grouping set — dims passed through or nulled per set, aggregate
    * inputs passed through unchanged, and the `spark_grouping_id`
    * literal. The rewrite keeps the Expand STRUCTURE (same projections,
    * same grouping-set algebra, dim output attrs reused verbatim so the
    * Aggregate above needs no re-keying) and re-bases it on the summary:
    * dim expressions remap to summary dims, and each measure passthrough
    * position splits into the partial columns the aggregates actually
    * consume (sum→m_sum, count→m_cnt, min/max→m_min/m_max, count(*) and
    * dim-arg counts→an m_count passthrough). Exactness is the same
    * rollup algebra as the flat case, applied per grouping set — at
    * 100 TB a ROLLUP that would Expand the lake |sets|× expands
    * |summary|×|sets| rows instead. Distinct-aggregate rewrites also
    * produce Expands (null-patterned measures); those classify as
    * neither dim nor uniform-measure positions and fall back safely. */
  private def rewriteExpand(agg: Aggregate, expand: Expand,
                            conds: Seq[Expression],
                            aliases: Map[ExprId, Expression],
                            d: SummaryDef): Option[LogicalPlan] = {
    val isHist = d.hist.isDefined
    def inline(e: Expression): Expression = e.transformUp {
      case a: AttributeReference if aliases.contains(a.exprId) =>
        aliases(a.exprId)
    }
    val fresh = d.summaryPlan transform {
      case lr: LogicalRelation => lr.newInstance()
    }
    val byName = fresh.output.map(a => a.name -> a).toMap
    val dimAttr: Map[String, Attribute] =
      d.dims.flatMap(n => byName.get(n).map(n -> _)).toMap
    // per-summary-row base-row multiplicity (rollup: m_count, hist: cnt)
    val mCountCol = if (isHist) byName("cnt") else byName("m_count")
    def isMeasureName(n: String): Boolean =
      if (isHist) d.hist.contains(n) else d.measures.contains(n)

    def trScalar(e: Expression): Option[Expression] = e match {
      case a: AttributeReference => dimAttr.get(a.name)
      case _: AggregateExpression => None
      case leaf if leaf.children.isEmpty => Some(leaf)
      case other =>
        val kids = other.children.map(trScalar)
        if (kids.forall(_.isDefined))
          Some(other.withNewChildren(kids.map(_.get)))
        else None
    }
    def sound(orig: Expression, repl: Expression): Boolean =
      orig.dataType == repl.dataType && (orig.nullable || !repl.nullable)

    val out = expand.output
    val projs = expand.projections.map(_.map(inline))
    if (projs.isEmpty || projs.exists(_.length != out.length)) return None

    // classify each output position: Left(per-set translated dim exprs)
    // or Right(measure name) for a uniform base-measure passthrough
    val posInfo: Seq[Option[scala.Either[Seq[Expression], String]]] =
      out.indices.map { p =>
        val es = projs.map(_(p))
        es.head match {
          case a: AttributeReference if isMeasureName(a.name) &&
              es.forall {
                case b: AttributeReference => b.exprId == a.exprId
                case _ => false
              } =>
            Some(scala.Right(a.name))
          case _ =>
            val trs = es.map(trScalar)
            if (trs.forall(_.isDefined)) Some(scala.Left(trs.map(_.get)))
            else None
        }
      }
    if (posInfo.exists(_.isEmpty)) return None
    val pos = posInfo.map(_.get)
    val dimPosIds: Set[ExprId] = out.indices.collect {
      case p if pos(p).isLeft => out(p).exprId
    }.toSet
    val measureName: Map[ExprId, String] = out.indices.collect {
      case p if pos(p).isRight => out(p).exprId -> pos(p).toOption.get
    }.toMap

    // partial-column passthroughs materialize lazily, keyed by
    // (measure position, role), so the new Expand carries exactly the
    // partials the aggregates consume
    val roleOrder = if (isHist) Seq("v") else Seq("sum", "cnt", "min", "max")
    val roleAttrs =
      scala.collection.mutable.LinkedHashMap[(ExprId, String),
        AttributeReference]()
    def roleSrc(role: String, m: String): Attribute =
      if (isHist) byName("v") else byName(s"m_${role}_$m")
    def roleAttr(a: AttributeReference, role: String): AttributeReference =
      roleAttrs.getOrElseUpdate((a.exprId, role), {
        val src = roleSrc(role, measureName(a.exprId))
        AttributeReference(s"_graft_${role}_${measureName(a.exprId)}",
          src.dataType, src.nullable)()
      })
    var mCountPt: Option[AttributeReference] = None
    def mCountAttr(): AttributeReference = mCountPt.getOrElse {
      val a = AttributeReference("_graft_m_count", mCountCol.dataType,
        mCountCol.nullable)()
      mCountPt = Some(a); a
    }

    def refsDim(e: Expression): Boolean =
      e.references.forall(r => dimPosIds.contains(r.exprId))
    def aggOver(fn: AggregateFunction,
                filter: Option[Expression]): AggregateExpression =
      AggregateExpression(fn, Complete, isDistinct = false, filter,
        NamedExpression.newExprId)

    def trAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.mode != Complete || !ae.filter.forall(refsDim)) None
      else ae.aggregateFunction match {
        case s @ Sum(a: AttributeReference, _)
            if !ae.isDistinct && measureName.contains(a.exprId) =>
          if (!isHist)
            Some(aggOver(s.withNewChildren(Seq(roleAttr(a, "sum")))
              .asInstanceOf[AggregateFunction], ae.filter))
          else if (Seq(ByteType, ShortType, IntegerType, LongType)
              .contains(byName("v").dataType))
            // Σ v·cnt — exact integer arithmetic only
            Some(aggOver(s.withNewChildren(Seq(Multiply(
                Cast(roleAttr(a, "v"), LongType), mCountAttr())))
              .asInstanceOf[AggregateFunction], ae.filter))
          else None
        case Count(children) if !ae.isDistinct =>
          children match {
            case Seq(a: AttributeReference)
                if measureName.contains(a.exprId) =>
              val c: Expression =
                if (isHist)
                  If(IsNotNull(roleAttr(a, "v")), mCountAttr(), Literal(0L))
                else roleAttr(a, "cnt")
              Some(Coalesce(Seq(aggOver(Sum(c), ae.filter), Literal(0L))))
            case cs if cs.forall(refsDim) =>
              val nonNull = cs.map(IsNotNull(_): Expression)
                .reduceOption(And).getOrElse(Literal(true))
              Some(Coalesce(Seq(
                aggOver(Sum(If(nonNull, mCountAttr(), Literal(0L))),
                  ae.filter), Literal(0L))))
            case _ => None
          }
        case Count(children) if ae.isDistinct =>
          // distinct dim (and hist-value) tuples survive the grain
          val trs = children.map {
            case a: AttributeReference
                if isHist && measureName.contains(a.exprId) =>
              Some(roleAttr(a, "v"): Expression)
            case c if refsDim(c) => Some(c)
            case _ => None
          }
          if (trs.forall(_.isDefined))
            Some(AggregateExpression(Count(trs.map(_.get)), Complete,
              isDistinct = true, ae.filter, NamedExpression.newExprId))
          else None
        case Min(a: AttributeReference)
            if measureName.contains(a.exprId) =>
          Some(aggOver(Min(roleAttr(a, if (isHist) "v" else "min")),
            ae.filter))
        case Max(a: AttributeReference)
            if measureName.contains(a.exprId) =>
          Some(aggOver(Max(roleAttr(a, if (isHist) "v" else "max")),
            ae.filter))
        case Min(e) if refsDim(e) && !ae.isDistinct => Some(ae)
        case Max(e) if refsDim(e) && !ae.isDistinct => Some(ae)
        case Average(a: AttributeReference, _)
            if !ae.isDistinct && measureName.contains(a.exprId) &&
              Seq(ByteType, ShortType, IntegerType, LongType)
                .contains(a.dataType) =>
          // same algebra as the flat path: the numerator re-aggregates
          // in DOUBLE (the base Average's own accumulator — a long
          // refold could overflow at 2^63 where the base cannot) over
          // the Σ count-partials translation
          val num: Expression =
            if (!isHist) Cast(roleAttr(a, "sum"), DoubleType)
            else Multiply(Cast(roleAttr(a, "v"), DoubleType),
              Cast(mCountAttr(), DoubleType))
          for {
            c <- trAgg(AggregateExpression(Count(Seq(a)), Complete,
              isDistinct = false, ae.filter, NamedExpression.newExprId))
          } yield Divide(aggOver(Sum(num), ae.filter),
            Cast(c, DoubleType), NumericEvalContext(EvalMode.LEGACY))
        case per: Percentile
            if isHist && !ae.isDistinct && !per.reverse &&
              per.frequencyExpression.foldable &&
              per.frequencyExpression.eval() == 1L &&
              (per.child match {
                case a: AttributeReference => measureName.contains(a.exprId)
                case _ => false
              }) =>
          val a = per.child.asInstanceOf[AttributeReference]
          Some(aggOver(per.copy(child = roleAttr(a, "v"),
            frequencyExpression = mCountAttr()), ae.filter))
        case _ => None
      }
    }

    def trTop(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => trAgg(ae)
      case a: AttributeReference =>
        if (dimPosIds.contains(a.exprId)) Some(a) else None
      case leaf if leaf.children.isEmpty => Some(leaf)
      case other =>
        val kids = other.children.map(trTop)
        if (kids.forall(_.isDefined))
          Some(other.withNewChildren(kids.map(_.get)))
        else None
    }

    val newConds = conds.map(trScalar)
    val groupOk = agg.groupingExpressions.forall(refsDim)
    val newAggs: Seq[Option[NamedExpression]] =
      agg.aggregateExpressions.map {
        case a: AttributeReference =>
          if (dimPosIds.contains(a.exprId)) Some(a) else None
        case al @ Alias(child, name) =>
          trTop(child).filter(sound(child, _))
            .map(nc => Alias(nc, name)(exprId = al.exprId))
        case _ => None
      }

    if (!groupOk || newConds.exists(_.isEmpty) || newAggs.exists(_.isEmpty))
      None
    else {
      def rolesAt(p: Int): Seq[String] =
        roleOrder.filter(r => roleAttrs.contains((out(p).exprId, r)))
      val newOut: Seq[Attribute] = out.indices.flatMap { p =>
        pos(p) match {
          case scala.Left(_) => Seq(out(p))
          case scala.Right(_) => rolesAt(p).map(r => roleAttrs((out(p).exprId, r)))
        }
      } ++ mCountPt.toSeq
      val newProjs: Seq[Seq[Expression]] = projs.indices.map { i =>
        out.indices.flatMap { p =>
          pos(p) match {
            case scala.Left(trs) => Seq(trs(i))
            case scala.Right(m) =>
              rolesAt(p).map(r => roleSrc(r, m): Expression)
          }
        } ++ mCountPt.map(_ => mCountCol: Expression).toSeq
      }
      val filtered = newConds.map(_.get)
        .reduceOption(And).map(Filter(_, fresh)).getOrElse(fresh)
      val needed = (newProjs.flatten ++ newConds.map(_.get))
        .flatMap(_.references).filter(fresh.outputSet.contains).distinct
      val child = filtered match {
        case Filter(c, rel) => Filter(c, Project(needed, rel))
        case rel => Project(needed, rel)
      }
      Some(agg.copy(aggregateExpressions = newAggs.map(_.get),
        child = Expand(newProjs, newOut, child)))
    }
  }

  private def rewriteWith(agg: Aggregate, conds: Seq[Expression],
                          aliases: Map[ExprId, Expression],
                          d: SummaryDef, baseRel: LogicalPlan,
                          star: Option[StarJoin]): Option[LogicalPlan] = {
    // inline the stem's project aliases so every expression below is in
    // terms of the base relation's own attributes (to fixpoint — an
    // above-join alias may reference a base-stem alias)
    def inline(e: Expression): Expression = {
      var x = e; var changed = true
      while (changed) {
        val next = x.transformUp {
          case a: AttributeReference if aliases.contains(a.exprId) =>
            aliases(a.exprId)
        }
        changed = !next.fastEquals(x); x = next
      }
      x
    }
    // fresh instance per use: two rewrites in one query must not share ids
    val fresh = d.summaryPlan transform {
      case lr: LogicalRelation => lr.newInstance()
    }
    val byName = fresh.output.map(a => a.name -> a).toMap
    val dimAttr: Map[String, Attribute] =
      d.dims.flatMap(n => byName.get(n).map(n -> _)).toMap
    val baseIds: AttributeSet = baseRel.outputSet
    val isHist = d.hist.isDefined
    // per-summary-row base-row multiplicity: hist rows carry `cnt`,
    // rollup rows carry `m_count`
    val mCount: Attribute = if (isHist) byName("cnt") else byName("m_count")
    def isMeasure(a: AttributeReference): Boolean =
      baseIds.contains(a) &&
        (if (isHist) d.hist.contains(a.name) else d.measures.contains(a.name))

    // Scalar translation: base dims remap to summary dims; the star
    // join's other side passes through verbatim; any other base
    // attribute (or anything unresolvable) aborts the rewrite.
    def trScalar(e: Expression): Option[Expression] = e match {
      case a: AttributeReference =>
        if (baseIds.contains(a)) dimAttr.get(a.name)
        else if (star.isDefined) Some(a)
        else None
      case _: AggregateExpression => None
      case leaf if leaf.children.isEmpty => Some(leaf)
      case other =>
        val kids = other.children.map(trScalar)
        if (kids.forall(_.isDefined))
          Some(other.withNewChildren(kids.map(_.get)))
        else None
    }
    // distinct-aggregate arguments may also name the hist measure: its
    // distinct values (and value tuples with dims) survive the grain
    def trDistinctArg(e: Expression): Option[Expression] = e match {
      case a: AttributeReference if isMeasure(a) && isHist =>
        Some(byName("v"))
      case _ => trScalar(e)
    }

    def aggOver(fn: AggregateFunction, isDistinct: Boolean,
                filter: Option[Expression]): AggregateExpression =
      AggregateExpression(fn, Complete, isDistinct, filter,
        NamedExpression.newExprId)

    // Aggregate-call translation per the rollup algebra in the scaladoc.
    def trAggCall(ae: AggregateExpression): Option[Expression] = {
      if (ae.mode != Complete) return None
      val filt: Option[Option[Expression]] = ae.filter match {
        case None => Some(None)
        case Some(f) => trScalar(f).map(Some(_))
      }
      filt.flatMap { f =>
        ae.aggregateFunction match {
          case s @ Sum(a: AttributeReference, _)
              if !ae.isDistinct && isMeasure(a) && !isHist =>
            Some(aggOver(s.withNewChildren(Seq(byName(s"m_sum_${a.name}")))
              .asInstanceOf[AggregateFunction], isDistinct = false, f))
          case s @ Sum(a: AttributeReference, _)
              if !ae.isDistinct && isMeasure(a) && isHist &&
                Seq(ByteType, ShortType, IntegerType, LongType)
                  .contains(byName("v").dataType) =>
            // Σ v·cnt — exact integer arithmetic only (a double's
            // per-row addition order would not reproduce)
            Some(aggOver(s.withNewChildren(Seq(Multiply(
                Cast(byName("v"), LongType), mCount)))
              .asInstanceOf[AggregateFunction], isDistinct = false, f))
          case Count(children) if !ae.isDistinct =>
            val contrib = children match {
              case Seq(a: AttributeReference) if isMeasure(a) =>
                // rollup kind pre-counted non-nulls; hist tests the
                // value column's null group directly
                if (isHist)
                  Some(If(IsNotNull(byName("v")), mCount, Literal(0L))
                    : Expression)
                else Some(byName(s"m_cnt_${a.name}"): Expression)
              case cs =>
                val trs = cs.map(trScalar)
                if (trs.forall(_.isDefined)) {
                  val nonNull = trs.map(t => IsNotNull(t.get))
                    .reduceOption[Expression](And).getOrElse(Literal(true))
                  Some(If(nonNull, mCount, Literal(0L)))
                } else None
            }
            contrib.map(c => Coalesce(Seq(
              aggOver(Sum(c), isDistinct = false, f), Literal(0L))))
          case Count(children) if ae.isDistinct =>
            // distinct dim (and hist-value) tuples survive the grain
            val trs = children.map(trDistinctArg)
            if (trs.forall(_.isDefined))
              Some(aggOver(Count(trs.map(_.get)), isDistinct = true, f))
            else None
          case Min(a: AttributeReference) if isMeasure(a) =>
            Some(aggOver(Min(if (isHist) byName("v")
              else byName(s"m_min_${a.name}")), isDistinct = false, f))
          case Max(a: AttributeReference) if isMeasure(a) =>
            Some(aggOver(Max(if (isHist) byName("v")
              else byName(s"m_max_${a.name}")), isDistinct = false, f))
          case Min(e) => trScalar(e).map(t =>
            aggOver(Min(t), isDistinct = false, f))
          case Max(e) => trScalar(e).map(t =>
            aggOver(Max(t), isDistinct = false, f))
          case Average(a: AttributeReference, _)
              if !ae.isDistinct && isMeasure(a) &&
                Seq(ByteType, ShortType, IntegerType, LongType)
                  .contains(a.dataType) =>
            // avg = Σ m_sum / Σ m_cnt. The numerator re-aggregates in
            // DOUBLE — the same accumulator type the base Average uses —
            // NOT as a long Sum: a long refold could overflow at 2^63
            // where the base's double buffer cannot (changing a result
            // or, under ANSI, failing a query the base serves). In the
            // integer-exact double range (< 2^53) the refold is
            // bit-equal to the base's accumulation; past it both are
            // double sums of the same values in different orders — the
            // base's own partial-merge nondeterminism envelope.
            // Integral measures only: a double measure's addition order
            // is observable at ANY magnitude, so it stays on the base
            // scan.
            val num: Expression =
              if (!isHist) Cast(byName(s"m_sum_${a.name}"), DoubleType)
              else Multiply(Cast(byName("v"), DoubleType),
                Cast(mCount, DoubleType))
            for {
              c <- trAggCall(AggregateExpression(Count(Seq(a)), Complete,
                isDistinct = false, ae.filter, NamedExpression.newExprId))
            } yield Divide(aggOver(Sum(num), isDistinct = false, f),
              Cast(c, DoubleType), NumericEvalContext(EvalMode.LEGACY))
          case per: Percentile
              if isHist && !ae.isDistinct && !per.reverse &&
                per.frequencyExpression.foldable &&
                per.frequencyExpression.eval() == 1L &&
                (per.child match {
                  case a: AttributeReference => isMeasure(a)
                  case _ => false
                }) =>
            // frequency-weighted Percentile reaches the identical
            // buffer state (value→count map), so results are bit-exact
            Some(aggOver(per.copy(child = byName("v"),
              frequencyExpression = mCount), isDistinct = false, f))
          case _ => None
        }
      }
    }

    def trAny(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => trAggCall(ae)
      case a: AttributeReference => trScalar(a)
      case leaf if leaf.children.isEmpty => Some(leaf)
      case other =>
        val kids = other.children.map(trAny)
        if (kids.forall(_.isDefined))
          Some(other.withNewChildren(kids.map(_.get)))
        else None
    }

    // exactness guards: same type, and never nullable where the original
    // promised non-null (parents may have codegen'd on that promise)
    def sound(orig: Expression, repl: Expression): Boolean =
      orig.dataType == repl.dataType && (orig.nullable || !repl.nullable)

    val newConds = conds.map(trScalar)
    val newGroup = agg.groupingExpressions.map(g => trScalar(inline(g)))
    val newAggs: Seq[Option[NamedExpression]] =
      agg.aggregateExpressions.map {
        case a: AttributeReference =>
          trAny(inline(a)).filter(sound(a, _)).map {
            // other-side attrs pass through untranslated — keep the
            // attribute itself rather than a self-referencing alias
            case na: AttributeReference if na.exprId == a.exprId => a
            case na => Alias(na, a.name)(exprId = a.exprId)
          }
        case al @ Alias(child, name) =>
          trAny(inline(child)).filter(sound(child, _))
            .map(nc => Alias(nc, name)(exprId = al.exprId))
        case _ => None
      }
    val newAbove = star.toSeq.flatMap(_.aboveConds)
      .map(c => trScalar(inline(c)))
    // inline() the join condition exactly like aboveConds/groupings: a
    // Project below the join may alias the join key (SELECT cat AS ck),
    // and an un-inlined alias exprId would survive translation verbatim,
    // leaving the rewritten Join referencing an attribute neither child
    // produces (unresolvable at BindReferences).
    val newJoinCond = star.flatMap(_.join.condition) match {
      case Some(c) => trScalar(inline(c)).map(Some(_))
      case None => Some(None)
    }

    if (newConds.exists(_.isEmpty) || newGroup.exists(_.isEmpty) ||
        newAggs.exists(_.isEmpty) || newAbove.exists(_.isEmpty) ||
        newJoinCond.isEmpty) None
    else {
      // prune the summary scan to exactly the referenced partials (the
      // filters' dims included — they sit above the pruning Project)
      val allExprs = newGroup.map(_.get) ++
        newAggs.map(_.get) ++ newConds.map(_.get) ++
        newAbove.map(_.get) ++ newJoinCond.get.toSeq
      val needed = allExprs.flatMap(_.references)
        .filter(fresh.outputSet.contains).distinct
      val baseSide = newConds.map(_.get).reduceOption(And)
        .map(Filter(_, Project(needed, fresh)))
        .getOrElse(Project(needed, fresh))
      val child = star match {
        case None => baseSide
        case Some(sj) =>
          val j2 =
            if (sj.baseIsLeft)
              sj.join.copy(left = baseSide, condition = newJoinCond.get)
            else sj.join.copy(right = baseSide, condition = newJoinCond.get)
          newAbove.map(_.get).reduceOption(And)
            .map(Filter(_, j2)).getOrElse(j2)
      }
      Some(Aggregate(newGroup.map(_.get), newAggs.map(_.get), child))
    }
  }

  /** Operator diagnostic: which scans of `df`'s OPTIMIZED plan read a
    * registered summary, and which still read a registered base — the
    * one-call answer to "did my dashboard get served, and from which
    * grain?". One line per file scan: `served <kind> dims=[...] <path>`
    * / `base-scan (not served) <path>` / `unregistered <path>`. */
  def explainServing(df: DataFrame): String = {
    import scala.jdk.CollectionConverters._
    val defs = registry.values.asScala.flatten.toSeq
    val opt = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.optimizedPlan
    val lines = opt.collect {
      case lr: LogicalRelation =>
        val roots = rawRoots(lr).getOrElse(Nil)
        val key = roots.mkString(" ")
        defs.find(_.summaryRoots.mkString(" ") == key) match {
          case Some(d) =>
            val kind = d.hist.map(m => s"hist($m)").getOrElse("rollup")
            s"served $kind dims=[${d.dims.mkString(",")}] $key"
          case None if registry.containsKey(key) =>
            s"base-scan (not served) $key"
          case None => s"unregistered $key"
        }
    }
    lines.mkString("\n")
  }

  /** Idempotent live-session registration (config-time path:
    * `graft.functions.GraftExtensions` injects this rule). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(SummaryRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SummaryRewrite
}
