package graft.analytics

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  private def langOf(s: String): String =
    Seq(s).toDF("t").select(TextAnalysis.langId(col("t")).as("l"))
      .head.getString(0)

  test("language ID: stopword argmax with fixed tie order") {
    assert(langOf("the cat sat on a mat full of cream") == "en")
    assert(langOf("le chat est dans la maison et il dort") == "fr")
    assert(langOf("der hund ist nicht ein kleines tier und") == "de")
    assert(langOf("los gatos y el perro es por la casa") == "es")
    assert(langOf("这 是 中文 文本") == "zh")
    assert(langOf("zxcv qwer asdf") == "und")
  }

  test("fingerprint is order-insensitive and duplicate-insensitive") {
    val df = Seq("b a c", "c b a", "a b c c").toDF("t")
    val fps = df.select(TextAnalysis.fingerprint(col("t")).as("f"))
      .as[String].collect()
    assert(fps.distinct.length == 1)
  }

  test("token count uses the single-space contract") {
    val r = Seq("a b  c").toDF("t")
      .select(TextAnalysis.tokenCount(col("t")).as("n")).head.getInt(0)
    assert(r == 4) // "a","b","","c" — empty token preserved, same as oracle
  }

  test("shingles: distinct word trigrams; short docs yield one shingle") {
    val r = Seq("a b c d").toDF("t")
      .select(TextAnalysis.shingles(col("t"), 3).as("s"))
      .head.getSeq[String](0)
    assert(r.toSet == Set("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(TextAnalysis.shingles(col("t"), 3).as("s"))
      .head.getSeq[String](0)
    assert(short.toSeq == Seq("a b"))
  }

  test("tokenChunks: window boundaries at every edge length " +
    "(short doc, exact window, one-past, last-stride, one-past-stride)") {
    def chunksOf(n: Int): Seq[(Long, Int)] = {
      val text = (1 to n).map(i => s"t$i").mkString(" ")
      Seq(text).toDF("text")
        .select(explode(TextAnalysis.tokenChunks(
          TextAnalysis.tokens(col("text")), 32, 24)).as("c"))
        .select(col("c.chunk_id"), size(split(col("c.chunk_text"), " ")))
        .as[(Long, Int)].collect().toSeq.sortBy(_._1)
    }
    assert(chunksOf(1) == Seq((0L, 1)))
    assert(chunksOf(32) == Seq((0L, 32)))
    // 33 tokens: second window starts at 24, holds 9
    assert(chunksOf(33) == Seq((0L, 32), (1L, 9)))
    // 56 = 24 + 32: second window exactly full
    assert(chunksOf(56) == Seq((0L, 32), (1L, 32)))
    // 57: third window starts at 48, holds 9
    assert(chunksOf(57) == Seq((0L, 32), (1L, 32), (2L, 9)))
    // every token index is covered by at least one window (57 tokens:
    // starts 0/24/48 cover 0..56 contiguously with 8-token overlaps)
    val covered = Seq(0, 24, 48).flatMap(s => s until math.min(s + 32, 57))
    assert(covered.toSet == (0 until 57).toSet)
  }

  test("quality gate rejects too-short and over-punctuated docs") {
    val df = Seq(
      ("good long document with plenty of reasonable words inside it", true),
      ("tiny", false),
      ("!!! ??? ... !!! ??? ... !!!", false)).toDF("t", "expect")
    val r = df.select(col("expect"),
      TextAnalysis.qualityKeep(col("t")).as("keep")).as[(Boolean, Boolean)]
      .collect()
    r.foreach { case (expect, keep) => assert(keep == expect) }
  }

  test("token estimate counts words and punctuation") {
    val r = Seq("hello, world! this is fine").toDF("t")
      .select(TextAnalysis.tokenEstimate(col("t")).as("n")).head.getInt(0)
    assert(r >= 7) // 5 words + 2 punct (+ length/16 term)
  }

  test("normalize is idempotent and conflates composed/decomposed forms") {
    val composed = "Caf\u00e9  NA\u00cfVE test"
    val decomposed = "Cafe\u0301  NAI\u0308VE test"
    val df = Seq((composed, decomposed)).toDF("c", "d")
    val r = df.select(
      TextAnalysis.normalize(col("c")).as("nc"),
      TextAnalysis.normalize(col("d")).as("nd"),
      TextAnalysis.normalize(TextAnalysis.normalize(col("c"))).as("nn"))
      .head
    assert(r.getString(0) == r.getString(1),
      "NFC must conflate composed and decomposed input")
    assert(r.getString(0) == r.getString(2), "normalize must be idempotent")
    assert(!r.getString(0).contains("  "), "whitespace runs must collapse")
  }

  test("redactPii leaves no residual matches and is idempotent") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map { i =>
      val bits = Seq(
        s"user$i.x+tag@mail$i-host.example.co",
        s"${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}",
        s"+${8 to 15 map (_ => rnd.nextInt(10)) mkString ""}",
        s"plain words ${rnd.alphanumeric.take(8).mkString}")
      new scala.util.Random(i).shuffle(bits).mkString(" ")
    }
    val df = rows.toDF("t")
    val red = df.select(TextAnalysis.redactPii(col("t")).as("r"))
    val residual = red.select(
      (TextAnalysis.piiCount(col("r"), TextAnalysis.EmailRe) +
        TextAnalysis.piiCount(col("r"), TextAnalysis.Ipv4Re) +
        TextAnalysis.piiCount(col("r"), TextAnalysis.PhoneRe)).as("n"))
      .agg(sum(col("n"))).head.getLong(0)
    assert(residual == 0L, "redacted text must contain no residual PII")
    val stable = red.select(
      (TextAnalysis.redactPii(col("r")) === col("r")).as("ok"))
      .agg(min(col("ok"))).head.getBoolean(0)
    assert(stable, "redaction must be idempotent")
  }

  test("classifierLogit is bounded by the weight range and " +
    "length-invariant for repeated tokens") {
    // weights are centi-units in [-50, 50] -> mean logit in [-0.5, 0.5]
    val df = Seq("alpha beta gamma", "x", "alpha alpha alpha alpha",
      "the quick brown fox", "").toDF("t")
    val r = df.select(TextAnalysis.classifierLogit(col("t")).as("l"))
      .as[Double].collect()
    assert(r.forall(l => l >= -0.5 && l <= 0.5), r.toSeq)
    // a doc of one repeated token scores exactly that token's weight
    val one = Seq("alpha", "alpha alpha alpha").toDF("t")
      .select(TextAnalysis.classifierLogit(col("t")).as("l"))
      .as[Double].collect()
    assert(one(0) == one(1), "mean logit must not depend on repetition")
  }

  test("unigramBits: every score is positive and rare-token docs cost " +
    "more bits than common-token docs") {
    val docs = (1 to 20).map(i => (i.toLong, "common words repeated")) ++
      Seq((100L, "zzyzx qwxyz vexing"))
    val df = docs.toDF("doc_id", "text")
    val bits = TextAnalysis.unigramBits(df, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(bits.values.forall(_ > 0), bits)
    assert(bits(100L) > bits(1L),
      s"rare-token doc must cost more bits: ${bits(100L)} vs ${bits(1L)}")
    Caches.clear()
  }

  test("fitUnigramModel + unigramBitsAgainst: the frozen-model serve path " +
    "scores the training corpus identically to unigramBits, and unseen " +
    "tokens cost the OOV smoothing floor (the most-expensive cost)") {
    val df = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "alpha alpha alpha"),
      (3L, "beta gamma delta epsilon")).toDF("doc_id", "text")
    val self = TextAnalysis.unigramBits(df, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val model = TextAnalysis.fitUnigramModel(df, col("text"))
    val served = TextAnalysis.unigramBitsAgainst(df, col("doc_id"),
      col("text"), model)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(served == self,
      s"frozen-model serve must equal self-trained scoring: $served vs $self")
    // a fully-OOV doc costs exactly the smoothing floor per token
    val oov = TextAnalysis.unigramBitsAgainst(
      Seq((9L, "zzz qqq")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), model)
      .as[(Long, Long, Double)].head()
    assert(oov._3 == model.oovMicroBits / 1e6,
      s"OOV doc must cost the floor: ${oov._3} vs ${model.oovMicroBits / 1e6}")
    Caches.clear()
  }

  test("dsirWeights: documents matching the target vocabulary weigh " +
    "more than off-target documents") {
    val target = (1 to 10).map(i => (i.toLong, "solar panel inverter grid", true))
    val other = (11 to 30).map(i => (i.toLong, "recipe flour butter sugar", false))
    val probeA = Seq((100L, "solar panel grid output", false))
    val probeB = Seq((101L, "butter sugar flour bowl", false))
    val df = (target ++ other ++ probeA ++ probeB)
      .toDF("doc_id", "text", "is_t")
    val w = TextAnalysis.dsirWeights(df, col("doc_id"), col("text"),
      col("is_t"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(w(100L) > w(101L),
      s"target-like doc must outweigh off-target: ${w(100L)} vs ${w(101L)}")
    Caches.clear()
  }

  test("dsirWeightsNgram: feature count is 2n-1 (unigrams + bigrams) and " +
    "word ORDER now matters — a scrambled doc scores differently") {
    val target = (1 to 10).map(i => (i.toLong, "solar panel inverter grid", true))
    val other = (11 to 30).map(i => (i.toLong, "recipe flour butter sugar", false))
    // same bag of words, different order: unigram DSIR cannot tell these
    // apart; bigram features can
    val probeA = Seq((100L, "solar panel inverter grid", false))
    val probeB = Seq((101L, "grid inverter panel solar", false))
    val df = (target ++ other ++ probeA ++ probeB)
      .toDF("doc_id", "text", "is_t")
    val w = TextAnalysis.dsirWeightsNgram(df, col("doc_id"), col("text"),
      col("is_t"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(w(100L)._1 == 7L, s"4 unigrams + 3 bigrams, got ${w(100L)._1}")
    assert(w(100L)._2 > w(101L)._2,
      "in-order target phrase must outweigh the scrambled bag: " +
        s"${w(100L)._2} vs ${w(101L)._2}")
    val uni = TextAnalysis.dsirWeights(df, col("doc_id"), col("text"),
      col("is_t"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(uni(100L) == uni(101L),
      "unigram DSIR is order-blind on identical bags by construction")
    Caches.clear()
  }

  /** In-memory reference BPE: same tiebreak (count desc, then pair text)
    * and greedy left-to-right merging as the distributed trainer. */
  private def refBpe(words: Map[String, Long],
                     merges: Int): Seq[(Int, String, String, Long)] = {
    var vocab = words.toSeq.map { case (w, f) =>
      (w.map(_.toString).toVector, f) }
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var done = false
    while (out.length < merges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), n) = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
        out += ((out.length + 1, l, r, n))
        vocab = vocab.map { case (syms, f) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.result(), f)
        }
      }
    }
    out.toSeq
  }

  test("bpeTrain merge sequence equals the in-memory reference BPE on " +
    "the sf0.001 corpus, and bpePairStats agrees with round 1") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val got = TextAnalysis.bpeTrain(docs, col("text"), merges = 8)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    val words = docs
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "").groupBy("w").agg(count(lit(1)).as("f"))
      .as[(String, Long)].collect().toMap
    val want = refBpe(words, 8)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    // the first merge is exactly the top char-pair statistic
    val top = TextAnalysis.bpePairStats(docs, col("text"))
      .orderBy(col("n").desc, col("pair")).limit(1)
      .as[(String, Long)].collect().head
    assert((got.head._2 + got.head._3, got.head._4) == top,
      s"round-1 merge ${got.head} vs pair stat $top")
    // random corpora: tiny alphabet forces dense pair collisions and
    // multi-level merges (merged symbols re-entering the pair stats)
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val rdocs = (1L to 10L).map { id =>
        (id, Seq.fill(rnd.nextInt(8) + 1)(
          Seq.fill(rnd.nextInt(6) + 1)("ab" (rnd.nextInt(2))).mkString)
          .mkString(" "))
      }
      val rGot = TextAnalysis.bpeTrain(rdocs.toDF("doc_id", "text"),
          col("text"), merges = 5)
        .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
      val rWords = rdocs.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
      assert(rGot == refBpe(rWords, 5), s"seed $seed: $rGot")
    }

    // a chain-merge fixture: "aaaa"×2 — the (a,a) STAT counts overlapping
    // occurrences (3 per word) but the REWRITE is greedy non-overlapping
    // ([aa,aa], never [aa,a,a] or a re-merged triple), and round 2 must
    // then merge (aa,aa) — the fold-vs-scan equivalence edge case
    val tiny = Seq((1L, "aaaa"), (2L, "aaaa")).toDF("doc_id", "text")
    val t = TextAnalysis.bpeTrain(tiny, col("text"), merges = 2)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(t == refBpe(Map("aaaa" -> 2L), 2), t)
  }

  test("bpeTrainBatched emits the EXACT sequential-greedy merge list " +
    "while committing multiple merges per round where provably safe") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val words = docs
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(col("w") =!= "").groupBy("w").agg(count(lit(1)).as("f"))
      .as[(String, Long)].collect().toMap
    val (gotDf, rounds) = TextAnalysis.bpeTrainBatchedWithRounds(
      docs, col("text"), merges = 16)
    val got = gotDf.as[(Int, String, String, Long)].collect()
      .toSeq.sortBy(_._1)
    assert(got == refBpe(words, 16), s"\ngot:  $got\nwant: ${refBpe(words, 16)}")
    info(s"sf0.001 corpus: 16 merges in $rounds rounds")

    // adversarial tiny alphabets: dense pair collisions force narrow
    // batches — the guards must DEGRADE to sequential, never diverge
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val rdocs = (1L to 12L).map { id =>
        (id, Seq.fill(rnd.nextInt(8) + 1)(
          Seq.fill(rnd.nextInt(7) + 1)("abc" (rnd.nextInt(3))).mkString)
          .mkString(" "))
      }
      val rWords = rdocs.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
      val rGot = TextAnalysis.bpeTrainBatched(
          rdocs.toDF("doc_id", "text"), col("text"), merges = 6)
        .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
      assert(rGot == refBpe(rWords, 6), s"seed $seed: $rGot")
    }

    // symbol-disjoint top pairs with well-separated counts: the whole
    // table must commit in ONE round — the 32k-vocab scale path
    val wide = (
      Seq.fill(90)("ab") ++ Seq.fill(80)("cd") ++ Seq.fill(70)("ef") ++
        Seq.fill(60)("gh") ++ Seq.fill(50)("ij"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val wideWords = Map("ab" -> 90L, "cd" -> 80L, "ef" -> 70L,
      "gh" -> 60L, "ij" -> 50L)
    val (wideDf, wideRounds) = TextAnalysis.bpeTrainBatchedWithRounds(
      wide, col("text"), merges = 5)
    assert(wideDf.as[(Int, String, String, Long)].collect().toSeq
      .sortBy(_._1) == refBpe(wideWords, 5))
    assert(wideRounds == 1,
      s"disjoint pairs must batch into one round, took $wideRounds")

    // the re-merge collision guard: "abab" re-creates pair (a,b) after
    // merging it — created tuples alias old ones, so batches must close
    // at the colliding member yet still match sequential greedy
    val collide = (Seq.fill(10)("abab") ++ Seq.fill(4)("xy"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val collideWords = Map("abab" -> 10L, "xy" -> 4L)
    val cGot = TextAnalysis.bpeTrainBatched(collide, col("text"),
        merges = 4)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(cGot == refBpe(collideWords, 4), s"collide: $cGot")
  }

  test("bpeApply replays a frozen merge table exactly like the reference " +
    "greedy rewrite, and subwords always reassemble the word") {
    // reference: one greedy non-overlapping left-to-right pass per merge
    def refApply(w: String, ms: Seq[(String, String)]): Vector[String] =
      ms.foldLeft(w.map(_.toString).toVector) { case (syms, (l, r)) =>
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            b += (l + r); i += 2
          } else { b += syms(i); i += 1 }
        }
        b.result()
      }
    val merges = Seq("e" -> "r", "i" -> "n", "s" -> "t", "l" -> "l",
      "t" -> "a", "w" -> "in", "ta" -> "b", "er" -> "g")
    // every merge regime: chains into ta+b / er+g, merged-as-right w+in,
    // l==r parity runs (llll → [ll,ll], lllll → [ll,ll,l]), no-ops
    val words = Seq("table", "merge", "window", "stall", "llll", "lllll",
      "winter", "er", "a", "x", "taber", "stab", "wininin") ++
      (1 to 50).map { i =>
        val rnd = new scala.util.Random(i)
        Seq.fill(rnd.nextInt(10) + 1)("abelrstwing" (rnd.nextInt(11)))
          .mkString
      }
    val got = words.toDF("w")
      .select(col("w"), TextAnalysis.bpeApply(col("w"), merges).as("s"))
      .as[(String, Seq[String])].collect().toMap
    words.foreach { w =>
      assert(got(w) == refApply(w, merges),
        s"'$w': ${got(w)} vs ${refApply(w, merges)}")
      assert(got(w).mkString == w, s"'$w' failed to reassemble: ${got(w)}")
    }
    // spot-pin the interesting shapes so a silently-weakened reference
    // can't hide a regression
    assert(got("table") == Vector("tab", "l", "e"))
    assert(got("merge") == Vector("m", "erg", "e"))
    assert(got("window") == Vector("win", "d", "o", "w"))
    assert(got("llll") == Vector("ll", "ll"))
    assert(got("lllll") == Vector("ll", "ll", "l"))
    // the native single-pass expression must equal the composed
    // bpeMergeOnce fold it replaced, element for element
    val both = words.toDF("w").select(
      TextAnalysis.bpeApply(col("w"), merges).as("n"),
      TextAnalysis.bpeApplyComposed(col("w"), merges).as("c"))
      .as[(Seq[String], Seq[String])].collect()
    assert(both.forall { case (n, c) => n == c })
  }

  test("logistic trainer learns signal: scored accuracy beats the " +
    "majority class and the informative weight turns positive") {
    // the cross-engine oracle only proves Spark == DuckDB — it would
    // stay green if training learned nothing (e.g. a sign error making
    // accuracy chance-level); this pins the training QUALITY invariant.
    // The label must be LEARNABLE: the driver's synthetic text is
    // statistically independent of the lang column (measured: EN-stop
    // ratio .0636 for lang='en' vs .0600 for the rest), so the
    // registered lang='en' query pins optimizer exactness, and THIS
    // spec pins learning on a label the length feature determines.
    val doc = graft.Tables.load(spark, sf001, "documents")
    val label = TextAnalysis.tokenCount(col("text")) >= 48
    val w = TextAnalysis.logisticFit(doc, col("text"), label,
      iters = 10).last
    // w = (bias, len, punct, stop, rep): x1 = capped len/64 carries
    // the signal, so its weight must turn positive and dominate
    assert(w(1) > 0, s"w_len must be positive after training: ${w(1)}")
    val scored = TextAnalysis.logisticScore(doc, col("doc_id"),
      col("text"), label, w)
    val agg = scored.agg(
      avg(col("correct")).as("acc"),
      greatest(avg(col("y")), lit(1.0) - avg(col("y"))).as("majority"))
      .head
    val (acc, majority) = (agg.getDouble(0), agg.getDouble(1))
    assert(acc > majority,
      s"scored accuracy $acc must beat the majority baseline $majority")
  }

  test("wordpieceTrain maximizes likelihood, not count: a rare fully-" +
    "fused pair beats a frequent loosely-coupled one") {
    // 'q'/'u' occur ONLY together (3×), while t/h/a/o are frequent but
    // loosely coupled. BPE's count argmax picks ta (7 > 3); the
    // WordPiece score ranks qu = 3/(3·3) = 1/3 far above every
    // alternative (best: ho = 6/(12·6) = 1/12).
    val df = Seq(
      "qu qu qu th th th",
      "th th th ta ta ta ta ho ho ho",
      "ta ta ta ho ho ho").toDF("text")
    val wp = TextAnalysis.wordpieceTrain(df, col("text"), merges = 1)
      .select("left", "right", "n", "score_nano").as[(String, String,
        Long, Long)].head()
    assert(wp._1 == "q" && wp._2 == "u", s"wordpiece picked $wp")
    assert(wp._3 == 3L)
    // score_nano is the exact integer the docs promise:
    // round(3e9 / (3*3)) = 333333333
    assert(wp._4 == 333333333L, s"score_nano ${wp._4}")
    val bpe = TextAnalysis.bpeTrain(df, col("text"), merges = 1)
      .select("left", "right").as[(String, String)].head()
    assert(bpe == (("t", "a")), s"bpe picked $bpe")
  }

  test("bm25Retrieve: the on-topic document ranks first, the df cap " +
    "silences corpus-wide boilerplate terms, k bounds the result") {
    // doc 1 is the only on-topic match for query terms {zebra, quartz};
    // 'filler' appears in EVERY doc (df = 100%) and must be cut by the
    // cap, so doc 3 (filler-only overlap) never scores
    val docsDf = (Seq(
      (1L, "zebra quartz alpha beta filler"),
      (2L, "zebra gamma delta epsilon filler"),
      (3L, "filler filler omega psi chi")) ++
      (4L to 30L).map(i => (i, s"pad$i padding body text filler")))
      .toDF("doc_id", "text")
    val q = Seq((100L, "zebra"), (100L, "quartz"), (200L, "filler"))
      .toDF("q_id", "term")
    val out = TextAnalysis.bm25Retrieve(docsDf, col("doc_id"),
      TextAnalysis.tokens(lower(col("text"))), q, k = 3,
      maxDfFrac = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val q100 = out.filter(_._1 == 100L).sortBy(_._2)
    // two-term match beats one-term match
    assert(q100.head == ((100L, 1L, 1L)), q100.toSeq)
    assert(q100.map(_._3).contains(2L))
    assert(q100.length <= 3)
    // the 100%-df term retrieves NOTHING
    assert(!out.exists(_._1 == 200L), out.toSeq)
  }

  test("textRank: the co-occurrence hub outranks leaves, a peripheral " +
    "word ranks lowest, integer ranks are deterministic") {
    val df = Seq(
      "hub alpha hub beta hub gamma hub delta hub alpha hub beta",
      "alpha hub beta hub gamma hub delta hub",
      "alpha beta gamma delta fringe").toDF("text")
    val r = TextAnalysis.textRank(df, col("text"), iters = 8)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // the hub participates in every edge; it must dominate
    assert(Seq("alpha", "beta", "gamma", "delta", "fringe").forall(
      w => r("hub") > r(w)), r)
    // 'fringe' has a single weak in-edge and no out-edge influence back
    assert(Seq("alpha", "beta", "gamma", "delta").forall(
      w => r(w) > r("fringe")), r)
    // every rank is at least the undamped base term
    assert(r.values.forall(_ >= 150000000L))
    val again = TextAnalysis.textRank(df, col("text"), iters = 8)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(again == r)
  }

  test("unigramTrain: singles always survive, a dominant word becomes " +
    "the piece its own segmentation uses, unused multis are pruned, " +
    "and the loop is deterministic") {
    // 'data' dominates; 'zebra' appears once so its non-single
    // substrings (ze, eb, zeb, ...) must be pruned by round 1's
    // used-count filter (they lose the DP to cheaper frequent pieces
    // or are simply below pruneMin)
    val df = (Seq.fill(40)("data data data") :+ "zebra").toDF("text")
    val out = TextAnalysis.unigramTrain(df, col("text"), rounds = 2,
      maxLen = 4, seedTop = 32, pruneMin = 2)
    val rows = out.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    val pieces = rows.map(_._1).toSet
    // completeness floor: every corpus character survives as a single
    assert(Set("d", "a", "t", "z", "e", "b", "r").subsetOf(pieces), pieces)
    // the dominant word survived as a whole piece with the top count
    val dataCnt = rows.find(_._1 == "data").map(_._2)
    assert(dataCnt.contains(120L), s"data count $dataCnt in ${rows.toSeq}")
    // and the DP actually uses it: its score beats the best split
    val m = rows.map(r => r._1 -> r._3).toMap
    val whole = m("data")
    val bestSplit = Seq(
      Seq("da", "ta"), Seq("d", "a", "t", "a"), Seq("dat", "a"))
      .filter(_.forall(m.contains))
      .map(_.map(m).sum).maxOption.getOrElse(Long.MinValue)
    assert(whole >= bestSplit,
      s"whole-word score $whole lost to a split $bestSplit")
    // one-shot substrings of 'zebra' were pruned (used < pruneMin)
    assert(!pieces.contains("zebr") && !pieces.contains("ebra"), pieces)
    // determinism: an independent rerun is identical
    val again = TextAnalysis.unigramTrain(df, col("text"), rounds = 2,
      maxLen = 4, seedTop = 32, pruneMin = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == rows.toSeq)
  }

  test("PMI collocations: planted fixed phrase, exact integer lift, " +
    "minCount prune, short-doc edge") {
    // "new york" always co-occurs (5 of each word, all paired); "of the"
    // co-occurs once despite frequent parts. Corpus: 5 docs "new york"
    // + 4 "of x"/"y the" fillers + 1 "of the" + a 1-token doc (no gram).
    val docsTxt =
      Seq.fill(5)("new york") ++
      (1 to 4).map(i => s"of w$i") ++ (1 to 4).map(i => s"v$i the") ++
      Seq("of the", "solo")
    val df = docsTxt.toDF("text")
    val out = TextAnalysis.pmiCollocations(df, col("text"),
      minCount = 5, topN = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // N = 21 tokens (5*2 + 8*2? no: 5*2=10, 8 fillers*2=16, of the=2,
    // solo=1 -> 29). c(new)=5, c(york)=5, c_pair(new york)=5.
    val n = 29L
    assert(out.length == 1, out.mkString(";"))
    val (g, cp, cl, cr, lift) = out.head
    assert(g == "new york" && cp == 5L && cl == 5L && cr == 5L)
    assert(lift == 5L * 1000000L * n / 25L) // = 5800000
    // "of the" (c_pair=1) was pruned by minCount; with minCount=1 it
    // appears with the hand-computed lower lift: c(of)=5, c(the)=5
    val all = TextAnalysis.pmiCollocations(df, col("text"),
      minCount = 1, topN = 100).collect()
      .map(r => (r.getString(0), r.getLong(4))).toMap
    assert(all("of the") == 1L * 1000000L * n / 25L) // = 1160000
    assert(all("new york") > all("of the"))
    // ranking = (lift desc, gram asc): a tie on lift orders by gram
    val top = TextAnalysis.pmiCollocations(df, col("text"),
      minCount = 1, topN = 100)
      .collect().map(r => (r.getLong(4), r.getString(0)))
    assert(top.sameElements(top.sortBy(t => (-t._1, t._2))))
  }

  test("readability: hand-computed syllables, sentence runs, and the " +
    "Flesch micro formula incl. the no-punctuation sentence floor") {
    // "the quick brown fox. it ran!! 42 xyz?" —
    // syllables: the=1 quick=2(ui is one run? q-u-i-ck: 'ui' one run =1)...
    // count vowel RUNS: the(1) quick(1: ui) brown(1: o... 'ow' no, w not
    // vowel; 'o'=1) fox.(1) it(1) ran!!(1) 42(0 -> floor 1) xyz?(1: y)
    val t = "the quick brown fox. it ran!! 42 xyz?"
    val df = Seq(t).toDF("text")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")).cast("long").as("w"),
      TextAnalysis.sentenceCount(col("text")).cast("long").as("s"),
      TextAnalysis.syllableCount(col("text")).cast("long").as("y"))
      .head
    val (w, s, y) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(w == 8L)       // single-space tokens
    assert(s == 3L)       // ".", "!!", "?" — each run is ONE terminator
    assert(y == 8L)       // 7 vowel runs + 1 vowel-less word ("42")
    val fl = df.select(TextAnalysis.fleschMicro(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.sentenceCount(col("text")),
      TextAnalysis.syllableCount(col("text"))).as("f")).head.getLong(0)
    assert(fl == 206835000L - 1015000L * 8 / 3 - 84600000L * 8 / 8)
    // fragment with no terminator: sentence floor = 1, not div-by-zero
    val frag = Seq("just a fragment").toDF("text")
      .select(TextAnalysis.sentenceCount(col("text")).as("s"))
      .head.getInt(0)
    assert(frag == 1)
    // empty text: the single-space contract yields one empty token,
    // which is vowel-less -> 1 syllable, score still defined
    val empty = Seq("").toDF("text").select(TextAnalysis.fleschMicro(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.sentenceCount(col("text")),
      TextAnalysis.syllableCount(col("text"))).as("f")).head.getLong(0)
    assert(empty == 206835000L - 1015000L - 84600000L)
  }

  test("classifierEval: hand-computed P/R/F1 micro-units on a planted " +
    "confusion matrix, incl. a predicted-only class and the ~macro row") {
    // actual:   a a a a b b c
    // predicted:a a b c b b d   -> d never actual, c never predicted right
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("a", "c"),
      ("b", "b"), ("b", "b"), ("c", "d")).toDF("act", "pred")
    val out = TextAnalysis.classifierEval(df, col("act"), col("pred"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    // a: act 4, pred 2, tp 2 -> P=1.0, R=0.5, F1=2*1e6*5e5/(15e5)=666666
    assert(out("a") == ((4L, 2L, 2L, 1000000L, 500000L, 666666L)))
    // b: act 2, pred 3, tp 2 -> P=666666, R=1e6, F1 floor(2*666666e6/1666666)
    val f1b = 2L * 666666L * 1000000L / 1666666L
    assert(out("b") == ((2L, 3L, 2L, 666666L, 1000000L, f1b)))
    // c: act 1, pred 1, tp 0 -> all zeros
    assert(out("c") == ((1L, 1L, 0L, 0L, 0L, 0L)))
    // d: predicted-only class -> recall denominator 0 scores 0
    assert(out("d") == ((0L, 1L, 0L, 0L, 0L, 0L)))
    // ~macro: totals + unweighted integer-mean of the 4 class rows
    val mp = (1000000L + 666666L + 0L + 0L) / 4
    val mr = (500000L + 1000000L + 0L + 0L) / 4
    val mf = (666666L + f1b + 0L + 0L) / 4
    assert(out("~macro") == ((7L, 7L, 4L, mp, mr, mf)))
    // the macro row sorts last under the bytewise class ORDER BY
    val order = TextAnalysis.classifierEval(df, col("act"), col("pred"))
      .collect().map(_.getString(0))
    assert(order.sameElements(Array("a", "b", "c", "d", "~macro")))
  }

  test("nextFitPack: hand-checked NFD bins per stratum, oversize docs " +
    "get their own bin, replay-deterministic") {
    // stratum A sizes desc: 60, 50, 40, 30, 20 at capacity 100:
    //   bin1 = {60}+{50}? 60+50=110 > 100 -> bin1={60,40} NO — next-fit
    //   is SEQUENTIAL: 60 -> bin1(60); 50: 110>100 -> bin2(50);
    //   40: 50+40=90 <= 100 -> bin2(90); 30: 120>100 -> bin3(30);
    //   20: 50 <= 100 -> bin3(50). bins: (1,[60]) (2,[50,40]) (3,[30,20])
    // stratum B: one 250-token doc at capacity 100 -> its own bin.
    val rows = Seq(("A", 1L, 30L), ("A", 2L, 60L), ("A", 3L, 50L),
      ("A", 4L, 20L), ("A", 5L, 40L), ("B", 6L, 250L))
    def run() = TextAnalysis.nextFitPack(rows.toDF("s", "id", "sz"),
      col("s"), col("id"), col("sz"), capacity = 100L)
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
      .toSeq
    val got = run()
    assert(got == Seq(("A", 1L, 1L, 60L), ("A", 2L, 2L, 90L),
      ("A", 3L, 2L, 50L), ("B", 1L, 1L, 250L)), s"got $got")
    assert(got == run(), "packing must replay identically")
    // NFD never exceeds capacity except on oversize singletons
    assert(got.filter(_._1 == "A").forall(_._4 <= 100L))
  }

  test("nextFitPack: equal sizes tie-break on id and the fold resets " +
    "exactly at stratum boundaries (no bleed between strata)") {
    // two strata, identical content: bins must be identical per stratum
    val rows = (1L to 6L).map(i => ("X", i, 40L)) ++
      (11L to 16L).map(i => ("Y", i, 40L))
    val got = TextAnalysis.nextFitPack(rows.toDF("s", "id", "sz"),
      col("s"), col("id"), col("sz"), capacity = 100L)
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3, r._4))
        .sortBy(_._1).toSeq).toMap
    // 6 docs of 40 at cap 100 -> bins of 2: (1,2,80)(2,2,80)(3,2,80)
    val expect = Seq((1L, 2L, 80L), (2L, 2L, 80L), (3L, 2L, 80L))
    assert(got("X") == expect && got("Y") == expect, s"got $got")
  }
}
