package graft.analytics

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Semantic pins for the retrieval-composition operators: hard-negative
  * mining (label-aware ANN), reciprocal-rank fusion, and MMR
  * diversification. The cross-engine oracle proves Spark==DuckDB; these
  * tests prove the operators do the RIGHT thing (a sign error that both
  * engines replayed identically would stay oracle-green).
  */
class RetrievalFusionSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf0001, "embeddings").cache()
  private lazy val queries = emb.filter(col("vec_id") % 100 === 0)

  test("hard negatives never share the query's label and rank by sim") {
    val r = Similarity.hardNegativesTopK(queries, emb,
      col("vec_id"), col("embedding"), col("label"),
      col("vec_id"), col("embedding"), col("label"), k = 10)
      .select($"q_id", $"q_label".cast("long"), $"n_id",
        $"n_label".cast("long"), $"sim", $"rank".cast("long"))
      .as[(Long, Long, Long, Long, Double, Long)].collect()
    assert(r.nonEmpty)
    assert(r.forall { case (_, ql, _, nl, _, _) => ql != nl })
    r.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._6)
      assert(sorted.map(_._6).toSeq == (1L to rows.length))
      assert(sorted.map(_._5).sliding(2).forall(p => p.head >= p.last))
    }
  }

  test("hard negatives = brute-force top-k over the different-label " +
    "corpus (the label filter is nomination, not post-hoc trimming)") {
    val qs = queries.limit(2).select(col("vec_id"), col("embedding"),
      col("label")).collect()
    qs.foreach { row =>
      val qid = row.getLong(0)
      val qlabel = row.getInt(2)
      val expect = Similarity.bruteForceTopK(
        queries.filter(col("vec_id") === qid),
        emb.filter(col("label") =!= qlabel),
        col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
        k = 10)
        .select("n_id").as[Long].collect().toSet
      val got = Similarity.hardNegativesTopK(
        queries.filter(col("vec_id") === qid), emb,
        col("vec_id"), col("embedding"), col("label"),
        col("vec_id"), col("embedding"), col("label"), k = 10)
        .select("n_id").as[Long].collect().toSet
      assert(got == expect)
    }
  }

  test("RRF fuses exactly 1/(60+ra) + 1/(60+rb) with single-system " +
    "candidates contributing one term") {
    val sparse = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("q_id", "id", "rank")
    val dense = Seq((1L, 11L, 1L), (1L, 12L, 2L)).toDF("q_id", "id", "rank")
    val got = Similarity.rrfFuse(sparse, dense, k = 10)
      .as[(Long, Long, Double, Long)].collect().sortBy(_._4)
    // id 11 appears in both systems -> two terms; 10 and 12 -> one each
    val expect11 = BigDecimal(1.0 / 61 + 1.0 / 62)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.head._2 == 11L && math.abs(got.head._3 - expect11) < 1e-9)
    assert(got.map(_._2).toSeq == Seq(11L, 10L, 12L))
    assert(got.map(_._4).toSeq == Seq(1L, 2L, 3L))
  }

  test("MMR rank-1 equals plain top-1, and a redundant pool is " +
    "diversified (a picked doc's max sim to earlier picks is bounded)") {
    val mmr = Similarity.mmrTopK(queries, emb,
      col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
      k = 5, pool = 20)
      .select($"q_id", $"rank", $"n_id", $"sim")
      .as[(Long, Long, Long, Double)].collect()
    Caches.clear()
    val top1 = Similarity.bruteForceTopK(queries, emb,
      col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
      k = 1).select($"q_id", $"n_id").as[(Long, Long)].collect().toMap
    Caches.clear()
    val byQ = mmr.groupBy(_._1)
    assert(byQ.values.forall(_.length == 5))
    byQ.foreach { case (q, rows) =>
      assert(rows.minBy(_._2)._3 == top1(q))
      assert(rows.map(_._3).distinct.length == 5)
    }
  }

  test("MMR on a planted redundant pool skips the near-duplicate that " +
    "plain top-k would return") {
    // corpus: query q; a and a2 nearly identical (both very close to q);
    // b distinct but still relevant. Plain top-2 = {a, a2}; MMR top-2
    // must be {a, b} because a2 is redundant with a.
    val mk = (id: Long, v: Seq[Double]) => (id, v.map(_.toFloat))
    val corpus = Seq(
      mk(1L, Seq(1.0, 0.0, 0.001)),
      mk(2L, Seq(1.0, 0.001, 0.0)),   // near-dup of 1
      mk(3L, Seq(0.6, 0.8, 0.0))      // distinct direction, relevant
    ).toDF("vec_id", "embedding")
    val q = Seq(mk(100L, Seq(1.0, 0.1, 0.0))).toDF("vec_id", "embedding")
    val plain = Similarity.bruteForceTopK(q, corpus, col("vec_id"),
      col("embedding"), col("vec_id"), col("embedding"), k = 2)
      .select("n_id").as[Long].collect().toSet
    assert(plain == Set(1L, 2L))
    // λ=μ=0.5: the near-dup's ~1.0 redundancy penalty outweighs its
    // ~0.32 relevance edge over the distinct doc
    val mmr = Similarity.mmrTopK(q, corpus, col("vec_id"),
      col("embedding"), col("vec_id"), col("embedding"), k = 2, pool = 3,
      lambda = 0.5, mu = 0.5)
      .select("n_id").as[Long].collect().toSet
    Caches.clear()
    assert(mmr == Set(2L, 3L))
  }

  test("contrastive triplets: positives share the label, negatives " +
    "never do, and the positive outranks any same-label alternative") {
    val pos = Similarity.labelTopK(queries, emb,
      col("vec_id"), col("embedding"), col("label"),
      col("vec_id"), col("embedding"), col("label"),
      k = 1, sameLabel = true)
      .select($"q_id", $"q_label".cast("long"), $"n_id",
        $"n_label".cast("long"), $"sim")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(pos.nonEmpty)
    assert(pos.forall { case (_, ql, _, nl, _) => ql == nl })
    // the k=1 positive must dominate the k=3 same-label ranking
    val pos3 = Similarity.labelTopK(queries, emb,
      col("vec_id"), col("embedding"), col("label"),
      col("vec_id"), col("embedding"), col("label"),
      k = 3, sameLabel = true)
      .select($"q_id", $"n_id", $"sim", $"rank".cast("long"))
      .as[(Long, Long, Double, Long)].collect()
    pos.foreach { case (q, _, nid, _, sim) =>
      val best = pos3.filter(r => r._1 == q).minBy(_._4)
      assert(best._2 == nid && best._3 == sim)
      assert(pos3.filter(_._1 == q).forall(_._3 <= sim))
    }
  }
}
