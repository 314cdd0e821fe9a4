package graft.analytics

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RetrievalEvalSpec extends SparkSuite {
  import spark.implicits._

  private def eval(run: Seq[(Long, Long, Int)],
                   ideal: Seq[(Long, Long, Int)], k: Int) =
    RetrievalEval.gradedTopKEval(run.toDF("q_id", "n_id", "rank"),
      ideal.toDF("q_id", "n_id", "rank"), k)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap

  test("a perfect run scores ndcg 1, mrr 1, hits k") {
    val ideal = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3))
    val out = eval(ideal, ideal, k = 3)
    assert(out(1L) == ((3L, 1000000L, 1.0)), s"got $out")
  }

  test("a fully-missed run scores zero everywhere, and the query still " +
    "appears via the qrel left join") {
    val ideal = Seq((1L, 10L, 1), (1L, 20L, 2))
    val run = Seq((1L, 77L, 1), (1L, 88L, 2))
    val out = eval(run, ideal, k = 2)
    assert(out(1L) == ((0L, 0L, 0.0)), s"got $out")
  }

  test("partial overlap matches the hand-computed graded DCG with the " +
    "literal discount table") {
    // ideal: a(rel 2) at 1, b(rel 1) at 2; run finds only a, at rank 2
    val ideal = Seq((1L, 10L, 1), (1L, 20L, 2))
    val run = Seq((1L, 99L, 1), (1L, 10L, 2))
    val w = RetrievalEval.dcgWeightsNano(2)
    val expected = BigDecimal(2L * w(1)) /
      BigDecimal(RetrievalEval.idcgNano(2))
    val out = eval(run, ideal, k = 2)
    val (hits, mrr, ndcg) = out(1L)
    assert(hits == 1L && mrr == 500000L, s"got $out")
    assert(math.abs(ndcg -
      expected.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      < 1e-9, s"ndcg $ndcg vs $expected")
  }

  test("discount table and idcg constant have the textbook endpoints") {
    val w = RetrievalEval.dcgWeightsNano(10)
    assert(w.head == 1000000000L, "rank-1 discount must be exactly 1")
    assert(w(1) == math.round(1e9 / (math.log(3) / math.log(2))))
    assert(RetrievalEval.idcgNano(10) ==
      w.zipWithIndex.map { case (x, i) => (10 - i) * x }.sum)
  }
}
