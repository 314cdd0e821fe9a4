package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding clustering for training-data pipelines: Lloyd's k-means with a
  * deterministic init, and SemDeDup-style semantic dedup (Abbas et al. 2023:
  * cluster the corpus, then search for near-duplicates only WITHIN each
  * cluster).
  *
  * Scale design: every Lloyd iteration is two hash aggregates over one
  * corpus scan — assignment is a broadcast join against the (tiny) centroid
  * table followed by a map-side-partial `max_by`, and the centroid update is
  * a `posexplode` → (cluster, pos) partial-avg, the same shape as the
  * oracle-checked `emb_centroid_stats`. The corpus is never sorted, never
  * windowed, never self-joined during clustering. SemDeDup then bounds the
  * quadratic pair search to within-cluster blocks: with k clusters over n
  * vectors the candidate volume drops from n²/2 to ~n²/(2k); production runs
  * pick k ∝ √n (the paper uses ~10⁵ clusters for 10⁹ docs) so per-cluster
  * blocks stay small enough for the pair join to be a within-partition
  * operation. This is the complementary scale path to `Similarity
  * .srpLshPairs` — LSH buckets by signature collision, SemDeDup buckets by
  * learned cluster structure, which also catches "same meaning, moderate
  * cosine" groups that a tight SRP threshold misses.
  *
  * Determinism contract (shared with the DuckDB oracles): init centroids are
  * an md5-hash-ranked sample of the corpus itself; assignment scores round
  * to 6 decimals before the argmax (ties → lower centroid id); updated
  * centroid components round to 6 decimals before the next iteration. Every
  * step is engine-portable, so the full iterated pipeline hash-matches SQL.
  */
object Clustering {

  import Similarity.norm

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** md5-derived deterministic rank in [0, 997) — the same engine-portable
    * sampling hash as `Similarity.hashRank` (IVF centroids / PQ codebooks);
    * the DuckDB oracles replay it literally. */
  private def hashRank(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10)
      .cast("long"), lit(997))

  /** Deterministic k-seed init: hash-filter the corpus (~1/16 survives the
    * `r < 64` cut) then take the k lowest (r, id) — a distributed
    * TakeOrdered over the pruned sample, never a global corpus sort. */
  private def initCentroids(v: DataFrame, k: Int): DataFrame =
    v.withColumn("r", hashRank(col("id")))
      .filter(col("r") < 64)
      .orderBy(col("r"), col("id")).limit(k)
      .select(col("id").as("cluster"), col("v").as("c_v"),
        col("nrm").as("c_n"))

  /** Assign every vector to its max-cosine centroid: broadcast the centroid
    * table, round scores to 6 decimals (cross-engine FP-sum ordering can
    * never flip an argmax), `max_by` hash aggregate with map-side partials
    * — no window/sort over the unique corpus key. */
  private def assign(v: DataFrame, cent: DataFrame): DataFrame =
    v.join(broadcast(cent))
      .select(col("id"), col("v"), col("nrm"), col("cluster"),
        round(Similarity.dot(col("v"), col("c_v")) /
          (col("nrm") * col("c_n")), 6).as("csim"))
      .groupBy(col("id"))
      .agg(max_by(struct(col("v"), col("nrm"), col("cluster")),
        struct(col("csim"), (-col("cluster")).as("tb"))).as("best"),
        max(struct(col("csim"), (-col("cluster")).as("tb"))).as("bs"))
      .select(col("id"), col("best.v").as("v"), col("best.nrm").as("nrm"),
        col("best.cluster").as("cluster"), col("bs.csim").as("csim"))

  /** Recompute centroids as the element-wise mean of their members
    * (posexplode → (cluster, pos) partial-avg hash aggregate, components
    * snapped to 6 decimals before the next assignment — the
    * `emb_centroid_stats` construction). Empty clusters drop out on both
    * engines identically. */
  private def updateCentroids(assigned: DataFrame): DataFrame =
    assigned.select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("cluster"), col("pos"))
      .agg(round(avg(col("x")), 6).as("cx"))
      .groupBy(col("cluster"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cx")))).as("pc"))
      .select(col("cluster"),
        transform(col("pc"), p => p.getField("cx")).as("c_v"))
      .withColumn("c_n", norm(col("c_v")))

  /** Lloyd's k-means over an embedding column: `iters` rounds of
    * assign-then-update from the deterministic seed sample, then a final
    * assignment against the converged centroids. Returns
    * `(id, cluster, csim)` — cluster labels are the seed vectors' ids
    * (stable across iterations).
    *
    * Each iteration re-scans the corpus once; callers loop a small fixed
    * `iters` (Lloyd converges fast and training pipelines value
    * reproducibility over the last decimal of inertia). The corpus frame
    * is persisted across iterations by the caller's session cache scope. */
  def kmeansAssign(emb: DataFrame, id: Column, vec: Column, k: Int = 8,
                   iters: Int = 2): DataFrame = {
    val v = Caches.persist(
      emb.select(id.as("id"), asDouble(vec).as("v"))
        .withColumn("nrm", norm(col("v"))))
    var cent = initCentroids(v, k)
    for (_ <- 1 to iters)
      cent = updateCentroids(assign(v, cent))
    // csim stays at assign's 6-decimal snap — re-rounding to fewer digits
    // would double-round (x.xxxx5 endpoints are COMMON after a first
    // round, and Spark's decimal-string HALF_UP vs the oracle's
    // binary-double rounding then disagree by one ulp of the last digit)
    assign(v, cent).select(col("id"), col("cluster"), col("csim"))
  }

  /** SemDeDup pairs `(a_id, b_id, sim)`: cosine >= threshold computed ONLY
    * within k-means clusters — the cluster id is the blocking key, so the
    * pair join is an equi-join on `cluster` instead of an all-pairs theta
    * join (plan-audited: no BroadcastNestedLoopJoin / CartesianProduct).
    * Precision is exact (every emitted pair carries its true cosine); like
    * every blocked dedup, recall misses only cross-cluster pairs — raise
    * `k` with corpus size to keep blocks small, or union with
    * `Similarity.srpLshPairs` for signature-based recall. */
  def semDedupPairs(emb: DataFrame, id: Column, vec: Column,
                    threshold: Double, k: Int = 8,
                    iters: Int = 2): DataFrame = {
    val v = Caches.persist(
      emb.select(id.as("id"), asDouble(vec).as("v"))
        .withColumn("nrm", norm(col("v"))))
    val a = kmeansAssign(emb, id, vec, k, iters)
      .select(col("id"), col("cluster"))
    val m = a.join(v, Seq("id"))
    val l = m.select(col("cluster"), col("id").as("a_id"),
      col("v").as("a_v"), col("nrm").as("a_n"))
    val r = m.select(col("cluster"), col("id").as("b_id"),
      col("v").as("b_v"), col("nrm").as("b_n"))
    l.join(r, Seq("cluster"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(Similarity.dot(col("a_v"), col("b_v")) /
          (col("a_n") * col("b_n")), 4).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
