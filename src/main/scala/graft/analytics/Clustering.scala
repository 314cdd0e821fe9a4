package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding clustering for training-data pipelines: Lloyd's k-means with a
  * deterministic init, and SemDeDup-style semantic dedup (Abbas et al. 2023:
  * cluster the corpus, then search for near-duplicates only WITHIN each
  * cluster).
  *
  * Scale design — the MLlib shape, not the join shape: the centroid set is
  * k·dim doubles (kilobytes), so it lives on the DRIVER between rounds and
  * enters each round as an array literal. Assignment is then a pure
  * projection — `array_max` over a `transform` of the centroid literal per
  * row — with ZERO shuffle, zero join, and no ×k row materialization; the
  * only distributed aggregate per round is the centroid update
  * (`posexplode` → (cluster, pos) partial-avg, shuffle volume = partitions
  * × k × dim partials, the `emb_centroid_stats` construction). The corpus
  * is never sorted, never windowed, never self-joined during clustering.
  * The per-round driver collect moves exactly k×dim doubles — the same
  * metadata-scale collect every production k-means (Spark MLlib included)
  * performs.
  *
  * SemDeDup then bounds the quadratic pair search to within-cluster
  * blocks: with k clusters over n vectors the candidate volume drops from
  * n²/2 to ~n²/(2k); production runs pick k ∝ √n (the paper uses ~10⁵
  * clusters for 10⁹ docs) so per-cluster blocks stay small. This is the
  * complementary scale path to `Similarity.srpLshPairs` — LSH buckets by
  * signature collision, SemDeDup buckets by learned cluster structure,
  * which also catches "same meaning, moderate cosine" groups that a tight
  * SRP threshold misses.
  *
  * Determinism contract (shared with the DuckDB oracles, which replay the
  * identical rounds declaratively): init centroids are an md5-hash-ranked
  * sample of the corpus itself; assignment scores round to 6 decimals
  * before the argmax (ties → lower centroid id); updated centroid
  * components round to 6 decimals before the next round. Every step is
  * engine-portable, so the full iterated pipeline hash-matches SQL.
  */
object Clustering {

  import Similarity.{asDouble, hashRank, norm}

  /** A centroid as plain driver-side data: cluster label (the seed
    * vector's id — stable across rounds), components, norm. Public so a
    * fitted model can be held, shipped, and re-applied (`fit` → `apply`
    * — the offline-train / online-serve split). */
  final case class Centroid(cluster: Long, components: Seq[Double],
                            norm: Double)

  /** Deterministic k-seed init: hash-filter the corpus (~1/16 survives the
    * `r < 64` cut) then take the k lowest (r, id) — a distributed
    * TakeOrdered over the pruned sample, never a global corpus sort.
    * A tiny corpus can leave the hash prune with ZERO survivors; rather
    * than silently fitting an empty model (null assignments downstream),
    * fall back to ranking the unpruned corpus — the ordering is identical,
    * so whenever the pruned path yields seeds at all the two agree — and
    * fail loudly only when the corpus itself is empty.
    *
    * CONTRACT: with 1..k-1 survivors the model is deliberately fitted
    * UNDERSIZED (that many centroids), NOT topped up from the unpruned
    * corpus — the DuckDB oracles replay exactly `r < 64 ORDER BY r, id
    * LIMIT k`, so a Spark-side top-up would diverge from them whenever
    * the prune undershoots. Callers that need exactly k clusters on tiny
    * corpora should lower k or check `fit(...).size`. */
  private def initCentroids(v: DataFrame, k: Int): Seq[Centroid] = {
    def seeds(src: DataFrame): Seq[Centroid] =
      src.orderBy(col("r"), col("id")).limit(k)
        .select(col("id"), col("v"), col("nrm"))
        .collect()
        .map(r => Centroid(r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
        .toSeq
    val ranked = v.withColumn("r", hashRank(col("id")))
    val pruned = seeds(ranked.filter(col("r") < 64))
    val cent = if (pruned.nonEmpty) pruned else seeds(ranked)
    require(cent.nonEmpty, "k-means needs a non-empty corpus to seed from")
    cent
  }

  /** The centroid set as one array-of-structs literal (k·dim doubles). */
  /** The literal model as ONE Literal node (round 17, guide §4): the
    * former per-element form (`array(struct(lit, lit, array(64 lits)))`
    * × k) put ~k·(dim+2) expression nodes into every plan that scores
    * against the model — walked by every analyzer/optimizer pass and
    * inlined by codegen, which profiling showed as driver time (stage
    * wall ≪ total) on the whole IVF/PQ family. `typedlit` folds the
    * same values into a single ArrayType Literal; the generated code
    * reads the array data instead of materializing per-element
    * constants. Values are bit-identical. */
  private final case class CentLit(cluster: Long, cn: Double,
                                   cv: Seq[Double])
  private final case class BisectCentLit(parent: Long, child: Long,
                                         cn: Double, cv: Seq[Double])
  private def centLiteral(cent: Seq[Centroid]): Column =
    typedlit(cent.map(c => CentLit(c.cluster, c.norm,
      c.components.toIndexedSeq)))

  /** Zero-shuffle assignment: per row, score every centroid inside a
    * `transform` over the literal and take the lexicographic `array_max`
    * of (csim, -cluster) — highest rounded cosine, ties to the lower
    * centroid id, identical to the oracle's ORDER BY csim DESC, cluster.
    * Appends `cluster` and `csim` columns; no join, no aggregate. */
  private def withAssignment(v: DataFrame, cent: Seq[Centroid]): DataFrame = {
    val best = array_max(transform(centLiteral(cent), c =>
      struct(
        round(Similarity.dot(col("v"), c.getField("cv")) /
          (col("nrm") * c.getField("cn")), 6).as("csim"),
        (-c.getField("cluster")).as("tb"))))
    v.withColumn("cluster", -best.getField("tb"))
      .withColumn("csim", best.getField("csim"))
  }

  /** One distributed centroid update: element-wise mean of each cluster's
    * members ((cluster, pos) partial-avg hash aggregate, components
    * snapped to 6 decimals), collected back to the driver (k×dim rows).
    * Norms fold left-to-right over ascending pos — the same sequential
    * order as the native DotProduct and the oracle's `list_sum`. Empty
    * clusters drop out on both engines identically. */
  private def updateCentroids(assigned: DataFrame): Seq[Centroid] =
    assigned.select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cluster"), col("pos"))
      .agg(round(avg(col("x")), 6).as("cx"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (cl, rows) =>
        val cv = rows.sortBy(_._2).map(_._3).toSeq
        Centroid(cl, cv, math.sqrt(cv.foldLeft(0.0)((a, x) => a + x * x)))
      }
      .toSeq.sortBy(_.cluster)

  /** The corpus frame with final-round assignment columns appended:
    * `(id, v, nrm, cluster, csim)` — shared by `kmeansAssign` (which
    * projects it) and `semDedupPairs` (which self-joins it on cluster,
    * vectors already in place). Runs the Lloyd rounds eagerly (one corpus
    * scan per round; `v` is persisted across them). */
  private def assignedFrame(emb: DataFrame, id: Column, vec: Column,
                            k: Int, iters: Int): DataFrame = {
    val v = Caches.persist(
      emb.select(id.as("id"), asDouble(vec).as("v"))
        .withColumn("nrm", norm(col("v"))))
    withAssignment(v, fitOn(v, k, iters))
  }

  private def fitOn(v: DataFrame, k: Int, iters: Int): Seq[Centroid] = {
    var cent = initCentroids(v, k)
    for (_ <- 1 to iters)
      cent = updateCentroids(withAssignment(v, cent))
    cent
  }

  /** Fit the k-means model and return it as driver-side data — the
    * offline-train half of the train/serve split. The model is k·dim
    * doubles; persist it however you like and re-apply with `classify`. */
  def fit(emb: DataFrame, id: Column, vec: Column, k: Int = 8,
          iters: Int = 2): Seq[Centroid] = {
    val v = Caches.persist(
      emb.select(id.as("id"), asDouble(vec).as("v"))
        .withColumn("nrm", norm(col("v"))))
    fitOn(v, k, iters)
  }

  /** Greedy k-center coreset selection (Gonzalez 1985, farthest-point
    * first): seed with the min-id vector, then k−1 rounds of "pick the
    * point farthest from its nearest already-selected center" — the
    * classic 2-approximation coverage sample, the diversity-sampling
    * primitive a curation pipeline uses to pick a representative subset
    * (coresets, eval-set seeding, annotation budgets).
    *
    * Plan: NO evolving state frame. Each round recomputes every point's
    * min cosine-distance to the selected set inside ONE projection over
    * a center-literal array (the `classify` trick — selected vectors are
    * driver state, ≤ k×dim doubles) and takes the argmax via TakeOrdered
    * (orderBy+limit(1) — k rows cross the wire, never a sort). Total
    * cost: k corpus scans of ≤ k literal dot products each, zero
    * shuffles, zero joins, constant plan depth per round — the exact
    * round structure `fit` uses, at any corpus size.
    *
    * Determinism: distance = 1 − round4(cosine); argmax ties break to
    * the smaller id; the DuckDB oracle replays every round in one
    * recursive CTE. Output: (rank, vec_id, radius) with radius the
    * chosen point's distance to the nearest earlier center — rank r's
    * radius is the covering-radius certificate after r−1 centers
    * (non-increasing; NULL for the seed). */
  def kCenterGreedy(emb: DataFrame, id: Column, vec: Column,
                    k: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    val v = Caches.persist(
      emb.select(id.as("id"), asDouble(vec).as("v"))
        .withColumn("nrm", norm(col("v"))))
    val seed = v.orderBy(col("id")).limit(1)
      .select(col("id"), col("v"), col("nrm")).collect().head
    var centers = Seq(Centroid(seed.getLong(0),
      seed.getSeq[Double](1), seed.getDouble(2)))
    var radii = Seq.empty[Double]
    for (_ <- 2 to k) {
      val mind = array_min(transform(centLiteral(centers), c =>
        lit(1.0) - round(Similarity.dot(col("v"), c.getField("cv")) /
          (col("nrm") * c.getField("cn")), 4)))
      val pick = v.filter(!col("id").isin(centers.map(_.cluster): _*))
        .withColumn("mind", mind)
        .orderBy(col("mind").desc, col("id"))
        .limit(1).select(col("id"), col("v"), col("nrm"), col("mind"))
        .collect().head
      centers :+= Centroid(pick.getLong(0), pick.getSeq[Double](1),
        pick.getDouble(2))
      radii :+= pick.getDouble(3)
    }
    import spark.implicits._
    centers.zipWithIndex.map { case (c, i) =>
      ((i + 1).toLong, c.cluster,
        if (i == 0) None else Some(radii(i - 1)))
    }.toDF("rank", "vec_id", "radius")
  }

  /** Apply a fitted model to ANY frame — batch or STREAMING — as a pure
    * zero-shuffle projection (the centroid literal rides inside the
    * expression, so this composes with readStream/foreachBatch with no
    * state and no extra plan nodes): appends `cluster` and `csim` next to
    * the input columns. The online-serve half of the split. */
  def classify(df: DataFrame, vec: Column,
               model: Seq[Centroid]): DataFrame = {
    require(model.nonEmpty, "empty centroid model")
    val tagged = df.withColumn("__v", asDouble(vec))
      .withColumn("__nrm", norm(col("__v")))
    val best = array_max(transform(centLiteral(model), c =>
      struct(
        round(Similarity.dot(col("__v"), c.getField("cv")) /
          (col("__nrm") * c.getField("cn")), 6).as("csim"),
        (-c.getField("cluster")).as("tb"))))
    tagged.withColumn("cluster", -best.getField("tb"))
      .withColumn("csim", best.getField("csim"))
      .drop("__v", "__nrm")
  }

  /** Per-row top-`nProbe` centroid ids as an exploded `list_id` column —
    * the IVF probe-selection half of the train/serve split, in the same
    * zero-shuffle literal shape as `classify`: scores round to 6 decimals,
    * ties → lower centroid id (descending (csim, -cluster) lexicographic
    * order, identical to the oracle's ORDER BY csim DESC, cl). Input
    * columns ride through; one output row per (input row × probe), so at
    * 100 TB the ×nProbe blow-up happens on the QUERY side only — callers
    * quantize/slim the row before probing, never after. */
  def probe(df: DataFrame, vec: Column, model: Seq[Centroid],
            nProbe: Int): DataFrame = {
    require(model.nonEmpty, "empty centroid model")
    val tagged = df.withColumn("__v", asDouble(vec))
      .withColumn("__nrm", norm(col("__v")))
    val scored = transform(centLiteral(model), c =>
      struct(
        round(Similarity.dot(col("__v"), c.getField("cv")) /
          (col("__nrm") * c.getField("cn")), 6).as("csim"),
        (-c.getField("cluster")).as("tb")))
    tagged
      .withColumn("list_id",
        explode(transform(slice(reverse(array_sort(scored)), 1, nProbe),
          s => -s.getField("tb"))))
      .drop("__v", "__nrm")
  }

  /** Lloyd's k-means over an embedding column: `iters` rounds of
    * assign-then-update from the deterministic seed sample, then a final
    * assignment against the converged centroids. Returns
    * `(id, cluster, csim)` — cluster labels are the seed vectors' ids
    * (stable across rounds). The returned frame's plan is a pure
    * projection over the cached corpus (plan-audited: zero hash
    * exchanges, no join, no window); the update aggregates ran eagerly
    * while iterating. csim stays at the 6-decimal snap — re-rounding to
    * fewer digits would double-round (x.xxxx5 endpoints are COMMON after
    * a first round, and Spark's decimal-string HALF_UP vs the oracle's
    * binary-double rounding then disagree by one ulp of the last digit).
    */
  def kmeansAssign(emb: DataFrame, id: Column, vec: Column, k: Int = 8,
                   iters: Int = 2): DataFrame =
    assignedFrame(emb, id, vec, k, iters)
      .select(col("id"), col("cluster"), col("csim"))

  /** Simplified silhouette (Hruschka et al., HIS 2004): per point,
    * a = cosine distance to its OWN centroid, b = distance to the best
    * OTHER centroid, s = (b−a)/max(a,b) ∈ [−1,1] — the O(n·k)
    * clustering-quality diagnostic that replaces the classic
    * silhouette's O(n²) pairwise distances with centroid distances,
    * which is the only version that survives corpus scale.
    *
    * Same zero-shuffle geometry as assignment: all k centroids ride one
    * literal, each row scores them inside a `transform` (6dp-rounded
    * cosine, the `withAssignment` contract), own = lexicographic
    * array_max (ties to the lower centroid id), other = array_max over
    * the remaining entries — no join, no aggregate, no second pass. A
    * degenerate point equidistant at zero from both centroids scores 0.
    *
    * Output: `(id, cluster, sil)` per point, sil rounded to 6dp (pure
    * IEEE subtract/divide on identical 6dp inputs — engine-portable). */
  def simplifiedSilhouette(emb: DataFrame, id: Column, vec: Column,
                           k: Int = 8, iters: Int = 2): DataFrame = {
    val v = Caches.persist(
      emb.select(id.as("id"), asDouble(vec).as("v"))
        .withColumn("nrm", norm(col("v"))))
    val cent = fitOn(v, k, iters)
    require(cent.size >= 2, "silhouette needs >= 2 surviving clusters")
    val simsCol = transform(centLiteral(cent), c =>
      struct(
        round(Similarity.dot(col("v"), c.getField("cv")) /
          (col("nrm") * c.getField("cn")), 6).as("csim"),
        (-c.getField("cluster")).as("tb")))
    val scored = v.withColumn("sims", simsCol)
      .withColumn("best", array_max(col("sims")))
      .withColumn("other", array_max(filter(col("sims"),
        s => s.getField("tb") =!= col("best.tb"))))
    val a = lit(1.0) - col("best.csim")
    val b = lit(1.0) - col("other.csim")
    scored.select(col("id"), (-col("best.tb")).as("cluster"),
      when(greatest(a, b) === 0.0, lit(0.0))
        .otherwise(round((b - a) / greatest(a, b), 6)).as("sil"))
  }

  /** Exact per-group median over a 6dp-QUANTIZED value column, computed
    * from a grouped histogram instead of a per-group value collection:
    * count per (group, value) — a partial-aggregatable hash aggregate —
    * then one bounded window over the DISTINCT values (≤ 2·10⁶ cells for
    * a 6dp value in [0,2], regardless of corpus row count), and the
    * median as the mean of the two middle ranks ((n+1) div 2 and
    * (n+2) div 2 — equal when n is odd). This is why the operators
    * below round to 6dp FIRST: quantization is what turns the classic
    * collect-and-sort median into a bounded-state aggregate that
    * survives 100 TB, and (lo+hi)/2 on identical doubles is the same
    * IEEE arithmetic in both engines — no reliance on any engine's
    * percentile interpolation internals. */
  private def medianByGroup(df: DataFrame, grp: String, v: String,
                            out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = df.groupBy(col(grp), col(v)).agg(count(lit(1)).as("cnt"))
    val w = h
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col(grp)).orderBy(col(v))))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col(grp))))
    w.groupBy(col(grp)).agg(round((
        min(when(col("cum") >= expr("(n + 1L) div 2L"), col(v))) +
        min(when(col("cum") >= expr("(n + 2L) div 2L"), col(v)))) / 2, 6)
      .as(out))
  }

  /** Robust embedding-outlier screen: a point is anomalous when its
    * cosine distance to its OWN k-means centroid sits far outside its
    * cluster's typical spread — `dist − med > cut · MAD` (one-sided:
    * only far-from-centroid points are outliers; the q48 median/MAD
    * discipline with cut = 4.4478 ≈ 3σ·1.4826 under normality, Leys
    * 2013). The corpus-hygiene screen that surfaces mis-embedded,
    * corrupted or out-of-distribution vectors before they poison
    * training mixes — mean/stddev z-scores break on exactly the heavy
    * tails outliers create, the median/MAD pair does not.
    *
    * Shape at scale: the assignment is the zero-shuffle centroid-literal
    * pass, persisted once (median and deviation both read it); each
    * median is a histogram aggregate + one bounded window (see
    * `medianByGroup` — 6dp quantization caps the window input at ~2e6
    * rows per cluster independent of corpus size); med/mad frames are
    * k-row broadcasts. Nothing collects, nothing sorts the corpus.
    *
    * Output: the flagged rows `(id, cluster, dist, med, mad)`, all 6dp.
    * A degenerate cluster (mad = 0) flags any point strictly above the
    * median — the correct collapse for a constant-distance cluster. */
  def embeddingOutliers(emb: DataFrame, id: Column, vec: Column,
                        k: Int = 8, iters: Int = 2,
                        cut: Double = 4.4478): DataFrame = {
    val ds = Caches.persist(
      kmeansAssign(emb, id, vec, k, iters)
        .select(col("id"), col("cluster"),
          round(lit(1.0) - col("csim"), 6).as("dist")))
    val med = medianByGroup(ds, "cluster", "dist", "med")
    val dv = Caches.persist(ds.join(broadcast(med), Seq("cluster"))
      .withColumn("dev", round(abs(col("dist") - col("med")), 6)))
    val mad = medianByGroup(dv, "cluster", "dev", "mad")
    dv.join(broadcast(mad), Seq("cluster"))
      .filter(col("dist") - col("med") > lit(cut) * col("mad"))
      .select(col("id"), col("cluster"), col("dist"), col("med"),
        col("mad"))
  }

  /** SemDeDup pairs `(a_id, b_id, sim)`: cosine >= threshold computed ONLY
    * within k-means clusters — the cluster id is the blocking key, so the
    * pair search is a SHUFFLE_HASH equi-join on `cluster` instead of an
    * all-pairs theta join (plan-audited: no BroadcastNestedLoopJoin /
    * CartesianProduct anywhere). Precision is exact (every emitted pair
    * carries its true cosine); like every blocked dedup, recall misses
    * only cross-cluster pairs — raise `k` with corpus size to keep blocks
    * small, or union with `Similarity.srpLshPairs` for signature-based
    * recall. */
  def semDedupPairs(emb: DataFrame, id: Column, vec: Column,
                    threshold: Double, k: Int = 8,
                    iters: Int = 2): DataFrame =
    pairsFrom(Caches.persist(assignedFrame(emb, id, vec, k, iters)),
      threshold)

  private def pairsFrom(m: DataFrame, threshold: Double): DataFrame = {
    val l = m.select(col("cluster"), col("id").as("a_id"),
      col("v").as("a_v"), col("nrm").as("a_n"))
    val r = m.select(col("cluster"), col("id").as("b_id"),
      col("v").as("b_v"), col("nrm").as("b_n"))
    l.join(r.hint("SHUFFLE_HASH"), Seq("cluster"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(Similarity.dot(col("a_v"), col("b_v")) /
          (col("a_n") * col("b_n")), 4).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** SemDeDup's keep policy in one clustering run: semantic pairs collapse
    * into connected components (`Dedup.dedupClusters` min-label
    * propagation) and each component keeps its member CLOSEST to the
    * k-means centroid (ties → lower id) — the paper's quality-aware
    * representative selection. Returns `(cluster_rep, keep_id,
    * n_members)`. The Lloyd pipeline runs ONCE; pairs and per-member csim
    * both derive from the same persisted assignment frame. */
  def semDedupKeep(emb: DataFrame, id: Column, vec: Column,
                   threshold: Double, k: Int = 8,
                   iters: Int = 2): DataFrame = {
    val m = Caches.persist(assignedFrame(emb, id, vec, k, iters))
    val pairs = pairsFrom(m, threshold)
    val clusters = Dedup.dedupClusters(pairs, col("a_id"), col("b_id"))
    clusters
      .join(m.select(col("id").as("doc_id"), col("csim")), Seq("doc_id"))
      .groupBy(col("cluster_rep"))
      .agg(max_by(col("doc_id"),
          struct(col("csim"), (-col("doc_id")).as("tb"))).as("keep_id"),
        count(lit(1)).as("n_members"))
  }

  /** Bisecting k-means (Steinbach/Karypis/Kumar KDD-workshop 2000),
    * level-synchronous: every level splits EVERY current cluster in two
    * with a 2-means refit scoped to that cluster's members, so `levels`
    * levels give up to 2^levels leaf clusters whose ids encode the split
    * path (cluster = parent·2 + child). Top-down bisection is the
    * production route to LARGE k: flat k-means pays k distance terms per
    * row per round, bisecting pays 2 per level — k=1024 costs 10 levels
    * × 2 terms instead of 1024 terms per row.
    *
    * Scale shape — identical to `fit`'s MLlib discipline, generalized to
    * a forest: ALL clusters' child centroids live in ONE driver-side
    * literal (2^level·2·dim doubles), assignment filters the literal to
    * the row's own parent (`filter` + `array_max` over a `transform`) —
    * still a ZERO-shuffle projection even though every cluster is being
    * split simultaneously; the per-round update is one (cluster, child,
    * pos) partial-avg aggregate for the whole forest. The only per-level
    * shuffle beyond that aggregate is the 2-seed window (partition by
    * cluster, top-2 by (hash-rank, id)). Levels are localCheckpointed —
    * constant plan depth however deep the tree.
    *
    * Determinism: seeds = each cluster's 2 lowest (`hashRank`, id)
    * members; csim rounds to 6 with ties to the LOWER child; update
    * components snap to 6 — the flat-k-means contract, replayed level by
    * level by the DuckDB oracle. A single-member cluster yields one seed
    * and stops splitting; a child emptied by reassignment drops out of
    * the update on both engines identically.
    *
    * Output: `(id, cluster, csim)` with cluster the leaf id in
    * [0, 2^levels) and csim the row's final-level similarity to its own
    * leaf centroid. */
  def bisectingAssign(emb: DataFrame, id: Column, vec: Column,
                      levels: Int = 2, iters: Int = 2): DataFrame = {
    val v0 = Caches.persist(
      emb.select(id.as("id"), asDouble(vec).as("v"))
        .withColumn("nrm", norm(col("v")))
        .withColumn("r", hashRank(col("id"))))
    var cur = v0.withColumn("cluster", lit(0L))
    for (_ <- 1 to levels) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster")).orderBy(col("r"), col("id"))
      // 2 seeds per cluster — a model-scale collect (≤ 2^level × 2 rows)
      var cents: Seq[(Long, Long, Seq[Double], Double)] =
        cur.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .select(col("cluster"), (col("rn") - 1).cast("long").as("child"),
            col("v"), col("nrm"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2),
            r.getDouble(3)))
          .toSeq
      // one Literal node, not 2^level·(dim+3) — see centLiteral (§4)
      def centLit: Column = typedlit(cents.map { case (p, c, cv, cn) =>
        BisectCentLit(p, c, cn, cv.toIndexedSeq)
      })
      def assigned: DataFrame = {
        val mine = filter(centLit, e =>
          e.getField("parent") === col("cluster"))
        val best = array_max(transform(mine, e => struct(
          round(Similarity.dot(col("v"), e.getField("cv")) /
            (col("nrm") * e.getField("cn")), 6).as("csim"),
          (-e.getField("child")).as("tb"))))
        cur.withColumn("child", -best.getField("tb"))
          .withColumn("csim", best.getField("csim"))
      }
      for (_ <- 1 to iters) {
        cents = assigned
          .select(col("cluster"), col("child"),
            posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy(col("cluster"), col("child"), col("pos"))
          .agg(round(avg(col("x")), 6).as("cx"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
            r.getDouble(3)))
          .groupBy(t => (t._1, t._2))
          .map { case ((p, c), rows) =>
            val cv = rows.sortBy(_._3).map(_._4).toSeq
            (p, c, cv, math.sqrt(cv.foldLeft(0.0)((a, x) => a + x * x)))
          }
          .toSeq.sortBy(t => (t._1, t._2))
      }
      cur = assigned
        .select(col("id"), col("v"), col("nrm"), col("r"),
          (col("cluster") * 2 + col("child")).as("cluster"), col("csim"))
        .localCheckpoint(false)
    }
    cur.select(col("id"), col("cluster"), col("csim"))
  }
}
