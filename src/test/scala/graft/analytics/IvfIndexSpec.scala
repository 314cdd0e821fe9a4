package graft.analytics

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The persisted IVF index (offline-build / online-serve split):
  * round-trip losslessness, rebuild determinism, and the probed-fraction
  * read the in-memory path cannot have (PartitionFilters — audited in
  * PlanAuditSpec via the registered query). */
class IvfIndexSpec extends SparkSuite {

  private def dir(tag: String) =
    java.nio.file.Files.createTempDirectory(s"ivf_idx_$tag").toString

  test("serving a persisted index equals the in-memory Lloyd path " +
    "row-for-row, and a second build is byte-stable (same model, same " +
    "results)") {
    val emb = graft.Tables.load(spark, sf0001, "embeddings")
    val (id, v) = (col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val direct = Similarity.ivfTopK(queries, emb, id, v, id, v, k = 10,
        refineIters = 2, replicas = 2)
      .collect().map(_.toSeq).toSet
    Caches.clear()

    val d1 = dir("a")
    Similarity.buildIvfIndex(emb, id, v, d1)
    Caches.clear()
    val served = Similarity.ivfTopKServe(spark, d1, queries, id, v, k = 10)
      .collect().map(_.toSeq).toSet
    assert(served == direct,
      s"served diverged: missing ${direct.diff(served).take(3)}, " +
        s"extra ${served.diff(direct).take(3)}")

    // rebuild determinism: a second independent build yields the same
    // model rows and the same answers
    val d2 = dir("b")
    Similarity.buildIvfIndex(emb, id, v, d2)
    Caches.clear()
    val m1 = Similarity.loadIvfModel(spark, d1)
    val m2 = Similarity.loadIvfModel(spark, d2)
    assert(m1 == m2, "centroid model not rebuild-stable")
    val served2 = Similarity.ivfTopKServe(spark, d2, queries, id, v, k = 10)
      .collect().map(_.toSeq).toSet
    assert(served2 == served)
    Caches.clear()
  }
}
