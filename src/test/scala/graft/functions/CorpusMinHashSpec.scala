package graft.functions

import graft.SparkSuite
import graft.analytics.TextAnalysis
import org.apache.spark.sql.functions._

class CorpusMinHashSpec extends SparkSuite {
  import spark.implicits._

  private val k = 32

  // two corpora with heavy shingle overlap and one disjoint
  private def corpora() = Seq(
    ("a", "the quick brown fox jumps over the lazy dog at dawn"),
    ("a", "the quick brown fox jumps over the lazy dog at night"),
    ("b", "the quick brown fox jumps over the lazy dog at dawn today"),
    ("c", "entirely different vocabulary with nothing shared whatsoever here"))
    .toDF("src", "text")

  private def sigs() = corpora()
    .select(col("src"),
      HashExpressions.minhashSignature(
        TextAnalysis.shingles(col("text"), 3), k).as("sig"))

  test("declarative corpus signature equals the typed Aggregator result") {
    val declarative = sigs().groupBy(col("src"))
      .agg(CorpusMinHash.corpusSignature(col("sig"), k).as("csig"))
      .as[(String, Seq[Long])].collect().toMap
    val agg = new CorpusMinHash.MinSignature(k)
    val typed = sigs().as[(String, Seq[Long])]
      .groupByKey(_._1).mapValues(_._2).agg(agg.toColumn)
      .collect().toMap
    assert(declarative.keySet == typed.keySet)
    declarative.foreach { case (s, sig) => assert(typed(s) == sig) }
  }

  test("estimated corpus Jaccard: overlapping corpora high, disjoint zero") {
    val m = sigs().groupBy(col("src"))
      .agg(CorpusMinHash.corpusSignature(col("sig"), k).as("csig"))
      .as[(String, Seq[Long])].collect().toMap
    val ab = CorpusMinHash.estimatedJaccard(m("a"), m("b"))
    val ac = CorpusMinHash.estimatedJaccard(m("a"), m("c"))
    assert(ab > 0.5, s"a~b estimate $ab too low")
    assert(ac == 0.0, s"a~c estimate $ac should be 0")
  }
}
