package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Oracle-checkable retrieval metrics: nDCG@k, MRR, and hit counts of an
  * ANN run against exact-brute-force qrels — the eval harness itself as
  * a first-class, hash-verifiable operator instead of spec-only code.
  * An index migration ("swap IVF for the graph index") ships with a
  * metric table both engines agree on to the last digit.
  */
object RetrievalEval {

  /** DCG rank discounts 1/log2(i+1), PRECOMPUTED in nano units and
    * shared with the oracle as literals — the HLL-table discipline: no
    * runtime log2 in either engine, so no libm divergence surface. */
  def dcgWeightsNano(k: Int): IndexedSeq[Long] =
    (1 to k).map(i => math.round(1e9 / (math.log(i + 1.0) / math.log(2.0))))

  /** The ideal DCG for qrels of exactly k graded items (rel = k..1 at
    * ranks 1..k) — a single constant, since every query's qrels here
    * are its exact top-k. */
  def idcgNano(k: Int): Long =
    dcgWeightsNano(k).zipWithIndex
      .map { case (w, i) => (k - i).toLong * w }.sum

  /** Per-query metrics of `run` against `ideal` (both `(q_id, n_id,
    * rank)` frames, ranks 1..k): graded relevance rel = k+1−ideal rank,
    * DCG as an INTEGER nano sum (order-independent — a double Σ would
    * hash-diverge under Spark's nondeterministic partial-agg order),
    * nDCG = one rounded division by the idcg constant, MRR in floor
    * micros, hits = |run ∩ ideal|. Queries with no hit score 0 (left
    * join from the qrel query set).
    *
    * Scale shape: one equi-join on (q_id, n_id) + one partial-agg per
    * query — both inputs are already top-k-bounded (|queries| × k
    * rows), so the eval costs less than either run it measures.
    *
    * Output: `(q_id, hits, mrr_micro, ndcg)`. */
  def gradedTopKEval(run: DataFrame, ideal: DataFrame,
                     k: Int): DataFrame = {
    val w = dcgWeightsNano(k)
    val idcg = idcgNano(k)
    val r = run
      .select(col("q_id"), col("n_id"), col("rank").cast("int").as("rrank"))
      .filter(col("rrank") <= k)
    val qrel = ideal.select(col("q_id"), col("n_id"),
      (lit(k + 1) - col("rank").cast("int")).as("rel"))
    val agg = r.join(qrel, Seq("q_id", "n_id"))
      .select(col("q_id"), col("rrank"),
        (col("rel").cast("long") *
          element_at(lit(w.toArray), col("rrank"))).as("term"))
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("hits"), sum(col("term")).as("dcg_nano"),
        min(col("rrank")).as("fr"))
    ideal.select(col("q_id")).distinct()
      .join(agg, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        coalesce(expr("1000000L div fr"), lit(0L)).as("mrr_micro"),
        round(coalesce(col("dcg_nano"), lit(0L)).cast("double")
          / lit(idcg.toDouble), 6).as("ndcg"))
  }
}
