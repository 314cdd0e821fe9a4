package graft.analytics

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Scale diagnostics for the batched BPE trainer: the batch WIDTH
  * (merges committed per Spark round) is what makes a 32k-merge
  * production vocabulary feasible — rounds ≈ merges/width, and each
  * round is a full vocabulary-scale job.
  *
  * Two corpora pin the two regimes:
  *  - the driver corpus is DEGENERATE for this purpose (31 distinct
  *    words over a 19-char alphabet — `SELECT count(DISTINCT w)` at
  *    every SF): top pairs perpetually share symbols, so the proven
  *    equivalence guards (symbol-disjointness, created-pair bound,
  *    merged-string freshness) close batches almost immediately.
  *    Width ~1.6 is the guards WORKING, not a defect — Bench reports
  *    the live number per round as `bpe_train`.
  *  - a diverse corpus (400 random 8-char words over 26 letters,
  *    Zipf-ish counts — still deterministic) separates top pairs into
  *    disjoint symbol sets, and width climbs. A natural-language
  *    corpus, with its far larger alphabet and Zipf head, sits beyond
  *    the diverse fixture.
  */
class BpeBatchWidthSpec extends SparkSuite {

  import spark.implicits._

  private def diverseDocs = {
    val rnd = new scala.util.Random(42)
    val words = (1 to 400).map(_ =>
      (1 to 8).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    (1 to 2000).map { i =>
      val k = 1 + rnd.nextInt(30)
      (i.toLong, (1 to k).map(_ =>
        words(math.min(399,
          (400 * math.pow(rnd.nextDouble(), 2)).toInt))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("diverse corpus: batching beats one-merge-per-round by >2x " +
    "(64 merges in <=32 rounds; measured width 2.4)") {
    val (df, rounds) =
      TextAnalysis.bpeTrainBatchedWithRounds(diverseDocs, col("text"), 64)
    val merges = df.count()
    info(s"merges=$merges rounds=$rounds width=${merges.toDouble / rounds}")
    assert(merges == 64, s"expected 64 merges, got $merges")
    assert(rounds <= 32,
      s"batch width regressed below 2.0: 64 merges took $rounds rounds")
    Caches.clear()
  }

  test("degenerate 31-word driver corpus: width floor 1.4 holds and the " +
    "batched list still equals sequential greedy (sf0.001)") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val (df, rounds) =
      TextAnalysis.bpeTrainBatchedWithRounds(docs, col("text"), 16)
    val merges = df.count()
    info(s"merges=$merges rounds=$rounds width=${merges.toDouble / rounds}")
    assert(merges == 16)
    assert(rounds <= 11,
      s"width fell below ~1.4 on the degenerate corpus: $rounds rounds")
    val seq = TextAnalysis.bpeTrain(docs, col("text"), 16)
    assert(df.orderBy("rank").collect().toSeq ==
      seq.orderBy("rank").collect().toSeq,
      "batched list diverged from sequential greedy")
    Caches.clear()
  }
}
