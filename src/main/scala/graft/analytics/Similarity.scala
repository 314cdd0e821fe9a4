package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (exact, O(|Q|·|C|) — broadcast the
  * query side, never shuffle the corpus). Scale path: IVF-style inverted
  * file — cluster corpus once, probe a few clusters per query, turning the
  * scan into a partition-pruned fraction of the corpus.
  *
  * All arithmetic is float→double cast then a sequential left-to-right fold
  * (`aggregate`/`zip_with`), which makes results bit-reproducible and
  * engine-portable for the DuckDB oracles.
  */
object Similarity {

  /** Dot product of two array<double> columns via a sequential fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** All pairs (a_id < b_id) with cosine similarity — candidate layer for
    * near-dup filtering. Quadratic: intended for within-bucket use or small
    * corpora; large-scale callers go through `ivfTopK`/LSH buckets. */
  def cosinePairs(emb: DataFrame, id: Column, vec: Column): DataFrame = {
    val n = emb.select(id.as("id"), asDouble(vec).as("v"))
      .withColumn("nrm", norm(col("v")))
    val a = n.select(col("id").as("a_id"), col("v").as("a_v"),
      col("nrm").as("a_n"))
    val b = n.select(col("id").as("b_id"), col("v").as("b_v"),
      col("nrm").as("b_n"))
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(dot(col("a_v"), col("b_v")) / (col("a_n") * col("b_n")), 4)
          .as("sim"))
  }

  /** Exact brute-force top-k: broadcast the (small) query set against the
    * corpus, rank per query. Tie-break on rounded sim then id →
    * deterministic. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, qId: Column,
                     qVec: Column, cId: Column, cVec: Column,
                     k: Int): DataFrame = {
    val q = queries.select(qId.as("q_id"), asDouble(qVec).as("q_v"))
      .withColumn("q_n", norm(col("q_v")))
    val c = corpus.select(cId.as("n_id"), asDouble(cVec).as("c_v"))
      .withColumn("c_n", norm(col("c_v")))
    val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(dot(col("q_v"), col("c_v")) / (col("q_n") * col("c_n")), 4)
          .as("sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rank"))
  }

  /** IVF (inverted-file) approximate top-k: assign every corpus vector to
    * its nearest of `nLists` centroids (deterministic seed), then answer a
    * query by scanning only the `nProbe` nearest lists. At 100 TB this is
    * the difference between a full scan and reading nProbe/nLists of the
    * data; centroid assignment is a broadcast join (centroids are tiny).
    *
    * Centroids here are a deterministic sample of the corpus itself
    * (k-means init without the iterations — recall tested in
    * SimilaritySpec); swap in `spark.ml` KMeans offline for production
    * centroids without changing the query path. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, qId: Column,
              qVec: Column, cId: Column, cVec: Column, k: Int,
              nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    val c = corpus.select(cId.as("n_id"), asDouble(cVec).as("c_v"))
      .withColumn("c_n", norm(col("c_v")))
    val centroids = c.withColumn("r", pmod(xxhash64(col("n_id")), lit(997)))
      .orderBy(col("r"), col("n_id")).limit(nLists)
      .select(col("n_id").as("list_id"), col("c_v").as("cent_v"),
        col("c_n").as("cent_n"))
    // assign: argmax cosine(corpus, centroid) — broadcast centroids
    val wAssign = Window.partitionBy(col("n_id"))
      .orderBy(col("csim").desc, col("list_id"))
    val assigned = c.join(broadcast(centroids))
      .select(col("n_id"), col("c_v"), col("c_n"), col("list_id"),
        (dot(col("c_v"), col("cent_v")) / (col("c_n") * col("cent_n")))
          .as("csim"))
      .withColumn("arank", row_number().over(wAssign))
      .filter(col("arank") === 1)
      .select(col("n_id"), col("c_v"), col("c_n"), col("list_id"))
    // probe: each query picks nProbe nearest lists
    val q = queries.select(qId.as("q_id"), asDouble(qVec).as("q_v"))
      .withColumn("q_n", norm(col("q_v")))
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("qsim").desc, col("list_id"))
    val probes = q.join(broadcast(centroids))
      .select(col("q_id"), col("q_v"), col("q_n"), col("list_id"),
        (dot(col("q_v"), col("cent_v")) / (col("q_n") * col("cent_n")))
          .as("qsim"))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= nProbe)
      .select(col("q_id"), col("q_v"), col("q_n"), col("list_id"))
    // scan only probed lists
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    assigned.join(broadcast(probes), Seq("list_id"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(dot(col("q_v"), col("c_v")) / (col("q_n") * col("c_n")), 4)
          .as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rank"))
  }
}
