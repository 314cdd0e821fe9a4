package graft.analytics

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Semantic pins for the Gopher rule bundle: each rule must fire on a
  * planted violation and only that rule (the flags are the product — a
  * pipeline tunes thresholds by watching WHICH rule fires). */
class CurationSpec extends SparkSuite {
  import spark.implicits._

  private val good =
    "the quick brown foxes jumped over a fence and ran to the creek in " +
      "good time that day with many other small animals following close " +
      "behind them all the way home through fields of tall green grass"

  private def flags(text: String): Map[String, Boolean] = {
    val df = Seq(text).toDF("text")
    val rules = TextAnalysis.gopherRules(col("text"))
    val row = df.select(rules.map { case (n, c) => c.as(n) }: _*)
      .collect().head
    rules.map(_._1).zipWithIndex
      .map { case (n, i) => n -> row.getBoolean(i) }.toMap
  }

  test("a clean document passes all five rules") {
    assert(flags(good).values.forall(identity))
  }

  test("each planted violation fires exactly its own rule") {
    val cases = Seq(
      // 13 words < minTokens=20, mean word length still in [4,5]
      "r_word_count" ->
        "the quick brown foxes jumped over every fence and ran to the creek",
      // words of length 1-2 -> mean word length < 4
      "r_mean_word_len" ->
        ("is a of in at it we he my up bb cc dd ee ff gg hh ii jj kk " +
          "the and"),
      // >5% punctuation
      "r_punct_ratio" -> (good + " !!!... ;;; ,,,, !!?!! ...,,;;;!!!"),
      // >20% pure-digit words (4-char so mean word length stays in range)
      "r_alpha_words" -> (good +
        " 1111 2222 3333 4444 5555 6666 7777 8888 9999 1010 1212 1313"),
      // no stopwords at all
      "r_stopwords" ->
        ("quick brown foxes jumped over fence ran creek good time day " +
          "many other small animals following close behind them all way"))
    cases.foreach { case (expected, text) =>
      val f = flags(text)
      assert(!f(expected), s"$expected should fire on: $text")
      (f - expected).foreach { case (other, v) =>
        assert(v, s"$other fired unexpectedly on the $expected fixture")
      }
    }
  }

  test("keep is the conjunction: one failing rule drops the doc") {
    val rules = TextAnalysis.gopherRules(col("text"))
    val keep = rules.map(_._2).reduce(_ && _)
    val r = Seq(good, "the a of and to").toDF("text")
      .select(keep.as("keep")).as[Boolean].collect()
    assert(r.toSeq == Seq(true, false))
  }

  test("entropy: uniform symbols hit log2(k) exactly, repetition " +
    "lowers word entropy, constant text scores zero") {
    val df = Seq(
      ("abcdabcdabcdabcd",                       // 4 chars, uniform
        "the cat sat on the mat with the hat"),  // mixed words
      ("aaaaaaaaaaaaaaaa",                       // constant chars
        "spam spam spam spam spam spam spam spam") // constant words
    ).toDF("chars_text", "words_text")
    val r = df.select(
      TextAnalysis.charEntropy(col("chars_text")).as("ce"),
      TextAnalysis.wordEntropy(col("words_text")).as("we"))
      .as[(Double, Double)].collect()
    // uniform over 4 symbols = exactly 2 bits; constant = exactly 0
    assert(r(0)._1 == 2.0)
    assert(r(1)._1 == 0.0 && r(1)._2 == 0.0)
    // diverse words carry more entropy than the 8x-repeated word
    assert(r(0)._2 > 2.0)
  }

  test("gopher + entropy gates compose as filters and keep exactly the " +
    "docs every rule and the entropy band admit") {
    import graft.streaming.Gates
    val clean = good  // passes all rules, entropy well inside [2.5, 6]
    val rows = Seq(
      (1L, clean),
      (2L, "the a of and to"),                        // gopher: too short
      // passes EVERY gopher rule (31 words, mwl 4.8, 2 stopwords) but
      // char entropy 0.80 bits — only the entropy band can drop it
      (3L, Seq.fill(29)("aaaaa").mkString(" ") + " the a")
    ).toDF("doc_id", "text")
    val kept = Gates.all(
      Gates.gopher("text"), Gates.entropyBand("text"))(rows)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L), kept)
    // the gate keep set must equal the batch rule conjunction + band
    val batch = rows.filter(
      TextAnalysis.gopherRules(col("text")).map(_._2).reduce(_ && _) &&
        TextAnalysis.charEntropy(col("text")).between(2.5, 6.0))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == batch)
  }

  test("native symbol entropy is bit-identical to the composed HOF " +
    "fold over the whole corpus, at both granularities") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val mismatches = docs.select(
      TextAnalysis.symbolEntropy(split(col("text"), "")).as("nc"),
      TextAnalysis.symbolEntropyHof(split(col("text"), "")).as("hc"),
      TextAnalysis.symbolEntropy(split(lower(col("text")), " ")).as("nw"),
      TextAnalysis.symbolEntropyHof(split(lower(col("text")), " "))
        .as("hw"))
      .filter(col("nc") =!= col("hc") || col("nw") =!= col("hw"))
      .count()
    assert(mismatches == 0)
  }
}
