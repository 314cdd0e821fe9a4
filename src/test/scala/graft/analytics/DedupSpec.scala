package graft.analytics

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf0001, "documents").cache()

  test("exact dedup keeps the min id per key") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "t")
    val r = Dedup.exact(df, col("id"), col("t"))
      .orderBy("keep_id").as[(Long, Long)].collect().toSeq
    assert(r == Seq((1L, 2L), (3L, 1L)))
  }

  test("newAgainst: in-batch min-id survives, history keys drop, " +
    "fresh keys pass") {
    val history = Seq((10L, "a"), (11L, "b")).toDF("id", "t")
    val incoming = Seq(
      (20L, "a"),  // in history → dropped
      (21L, "c"), (22L, "c"), // in-batch dup → 21 kept
      (23L, "d")   // fresh → kept
    ).toDF("id", "t")
    val r = Dedup.newAgainst(history, incoming, col("id"), col("t"))
      .orderBy("new_id").as[Long].collect().toSeq
    assert(r == Seq(21L, 23L))
  }

  test("jaccard pairs: identical docs score 1.0, disjoint docs absent") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the dog"),
      (2L, "the quick brown fox jumps over the dog"),
      (3L, "entirely different words here nothing shared at all"))
      .toDF("id", "t")
    val r = Dedup.jaccardPairs(df, col("id"), col("t"), 3, 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(r == Seq((1L, 2L, 1.0)))
  }

  test("simhash: identical text → distance 0; small edit → small distance") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"))
      .toDF("id", "t")
    val h = df.select(col("id"), Dedup.simhash(col("t")).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(h(1L) == h(2L))
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) <= 16)
  }

  test("simhash pigeonhole bucketing finds all pairs within maxDist " +
    "(vs brute force on sf0.001 documents)") {
    val pairs = Dedup.simhashPairs(docs, col("doc_id"), col("text"), 3)
      .as[(Long, Long, Long)].collect().toSet
    // brute force over collected hashes
    val hs = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("h"))
      .as[(Long, Long)].collect()
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(pairs == brute)
  }

  test("containmentPairs finds a short doc embedded in a long one that " +
    "symmetric Jaccard misses, in the right direction only") {
    val embedded = "alpha beta gamma delta epsilon"
    val long = s"$embedded " +
      (1 to 40).map(i => s"filler$i word$i").mkString(" ")
    val df = Seq((1L, embedded), (2L, long), (3L, "unrelated text here"))
      .toDF("doc_id", "text")
    val ct = Dedup.containmentPairs(df, col("doc_id"), col("text"),
        n = 3, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(p => (p._1, p._2))
    // every 3-shingle of doc 1 occurs in doc 2 → containment(1 in 2)=1.0;
    // the reverse direction and doc 3 stay out
    assert(ct == Seq((1L, 2L, 1.0)), s"got $ct")
    val jac = Dedup.jaccardPairs(df, col("doc_id"), col("text"),
        n = 3, threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSeq
    assert(jac.isEmpty,
      s"fixture must be invisible to symmetric Jaccard@0.3: $jac")
    graft.analytics.Caches.clear()
  }

  test("containmentPairsBlocked finds the planted embedded pair (winnowing " +
    "coverage guarantee: the shared run is far longer than window+n-1)") {
    val embedded = "alpha beta gamma delta epsilon zeta eta theta"
    val long = s"$embedded " +
      (1 to 40).map(i => s"filler$i word$i").mkString(" ")
    val df = Seq((1L, embedded), (2L, long), (3L, "unrelated text here"))
      .toDF("doc_id", "text")
    val ct = Dedup.containmentPairsBlocked(df, col("doc_id"), col("text"),
        n = 3, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(ct == Seq((1L, 2L, 1.0)), s"got $ct")
    graft.analytics.Caches.clear()
  }

  test("containmentPairsBlocked with a BINDING maxDf cap: hot boilerplate " +
    "fingerprints are dropped, yet the planted embedded pair is still " +
    "found through its unique-run fingerprints") {
    val boiler = "terms of service apply to all content on this site " +
      "always and forever without exception"
    val uniq = "quantum raven sails violet harbor under midnight copper " +
      "skies while amber foxes trace silent rivers"
    val hotDocs = (1L to 8L).map(i =>
      (i, s"$boiler unique${i}a unique${i}b unique${i}c unique${i}d"))
    val df = (hotDocs ++ Seq(
      (100L, uniq),
      (101L, s"$uniq extra trailing words beyond the quoted passage " +
        "continue here with more novel content entirely")))
      .toDF("doc_id", "text")
    // cap 3 < boilerplate df 8: every boiler fingerprint is dropped; the
    // uniq-run fingerprints have df 2 and carry the pair. Threshold 0.7
    // would admit the boiler-overlap pairs (containment 12/16 = 0.75) —
    // the cap, not the threshold, is what excludes them.
    val ct = Dedup.containmentPairsBlocked(df, col("doc_id"), col("text"),
        n = 3, threshold = 0.7, maxDf = 3)
      .as[(Long, Long, Double)].collect().toSeq
    assert(ct == Seq((100L, 101L, 1.0)), s"got $ct")
    graft.analytics.Caches.clear()
    // sanity: with the cap off, the same threshold DOES surface the
    // boiler block — proving the capped run dropped it via df, and that
    // the planted pair never depended on hot fingerprints
    val uncapped = Dedup.containmentPairsBlocked(df, col("doc_id"),
        col("text"), n = 3, threshold = 0.7, maxDf = Int.MaxValue)
      .select("sub_id", "super_id").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((100L, 101L)))
    assert(uncapped.exists { case (a, b) => a <= 8 && b <= 8 },
      s"expected boiler pairs uncapped, got $uncapped")
    graft.analytics.Caches.clear()
  }

  test("containmentPairsBlocked equals exact containmentPairs on sf0.001 " +
    "documents (full recall on the corpus's embedded duplication)") {
    val exact = Dedup.containmentPairs(docs, col("doc_id"), col("text"),
        n = 3, threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    graft.analytics.Caches.clear()
    val blocked = Dedup.containmentPairsBlocked(docs, col("doc_id"),
        col("text"), n = 3, threshold = 0.8)
      .as[(Long, Long, Double)].collect().toSet
    graft.analytics.Caches.clear()
    assert(exact.nonEmpty, "fixtureless corpus: exact containment is empty")
    assert(blocked == exact,
      s"missed: ${exact.diff(blocked)}; extra: ${blocked.diff(exact)}")
  }

  test("minhash-LSH pairs equal exhaustive jaccard pairs at sf0.001 " +
    "(full recall at threshold 0.7)") {
    val lsh = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val exact = Dedup.jaccardPairs(docs, col("doc_id"), col("text"), 3, 0.7)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(lsh == exact)
  }

  test("prefix-filtered jaccard equals the exhaustive operator on sf0.001 " +
    "(pairs AND values), and a corpus-wide hot shingle stays out of " +
    "every prefix") {
    val pfx = Dedup.jaccardPairsPrefix(docs, col("doc_id"), col("text"),
        3, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val exact = Dedup.jaccardPairs(docs, col("doc_id"), col("text"), 3, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(pfx == exact, "prefix filter must be lossless at the threshold")
    assert(pfx.nonEmpty, "fixture must exercise the operator")

    // hot-token behavior: every doc shares the boilerplate head, so its
    // shingles have df = |docs| and must be ordered LAST — two docs whose
    // only overlap is the boilerplate produce no candidate, while a real
    // near-dup pair still surfaces through its rare tokens
    val hot = "shared boilerplate header line "
    val planted = Seq(
      (1L, hot + "alpha beta gamma delta epsilon zeta"),
      (2L, hot + "alpha beta gamma delta epsilon eta"),
      (3L, hot + "one two three four five six"),
      (4L, hot + "seven eight nine ten eleven twelve"))
      .toDF("id", "t")
    val got = Dedup.jaccardPairsPrefix(planted, col("id"), col("t"), 3, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val want = Dedup.jaccardPairs(planted, col("id"), col("t"), 3, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == want, "planted corpus must agree with the exact operator")
    assert(got.contains((1L, 2L)), "the rare-token near-dup pair is found")
    assert(!got.exists(p => p == (3L, 4L) || p == (1L, 3L)),
      "boilerplate-only overlap must not pair")
  }

  test("prefix Jaccard: IEEE-hostile threshold (t·n integral in the " +
    "reals but rounding UP in doubles) keeps the exactness contract — " +
    "a containment pair sitting exactly AT t=0.07 must survive the " +
    "length filter") {
    // B ⊂ A with |A|=100 shingles, |B|=7: J = 7/100 = 0.07 exactly.
    // The length filter needs b_n >= ceil(0.07·100); 100·0.07 in IEEE is
    // 7.000000000000001, a naive ceil says 8 and silently drops the
    // qualifying pair (round-11 advice). Integer-faithful ceil keeps it.
    val bToks = (1 to 9).map(i => s"s$i")
    val aToks = bToks ++ (1 to 93).map(i => s"u$i")
    val docs = Seq((1L, aToks.mkString(" ")), (2L, bToks.mkString(" ")))
      .toDF("id", "t")
    val got = Dedup.jaccardPairsPrefix(docs, col("id"), col("t"), 3, 0.07)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)),
      s"the exactly-at-threshold pair must survive: $got")
    // and the pair really is AT the threshold, not above it
    val j = Dedup.jaccardPairs(docs, col("id"), col("t"), 3, 0.07)
      .select("jaccard").as[Double].collect().head
    assert(j == 0.07, s"fixture must sit exactly at t: $j")
  }

  test("embedding near-dups FIND every planted perturbed twin (recall is " +
    "observed, not vacuously true) and stay symmetric-free") {
    // The fixture's organic max pairwise cosine is ~0.51, so on the raw
    // table this operator correctly returns empty — which also means a
    // broken always-empty operator would pass a forall-shaped assertion.
    // Plant deterministic twins (component i scaled by (98+i%5)/100 →
    // cosine ≈ 0.9998) and require each planted pair to come back.
    val emb = Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val twins = emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x * ((lit(98) + i % 5).cast("double") / lit(100.0)))
          .as("embedding"))
    val nPlanted = twins.count()
    assert(nPlanted >= 3, s"fixture too small to plant twins: $nPlanted")
    val r = Dedup.embeddingNearDups(emb.union(twins), col("vec_id"),
        col("embedding"), 0.95)
      .as[(Long, Long, Double)].collect()
    assert(r.forall { case (a, b, s) => a < b && s >= 0.95 })
    val found = r.map(p => (p._1, p._2)).toSet
    val expected = twins.select(col("vec_id")).as[Long].collect()
      .map(t => (t - 1000000L, t)).toSet
    assert(expected.subsetOf(found),
      s"planted pairs missed: ${expected.diff(found)}")
    graft.analytics.Caches.clear()
  }

  test("dedupClusters: a chain collapses to one component (multi-round " +
    "propagation) and disjoint cliques stay separate") {
    // chain 1-2-3-4-5 (diameter 4 forces several propagation rounds) plus
    // clique {10,11,12} and isolated pair (20,21)
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L)).toDF("a_id", "b_id")
    val r = Dedup.dedupClusters(pairs, col("a_id"), col("b_id"))
      .as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(r(_) == 1L), r)
    assert(Seq(10L, 11L, 12L).forall(r(_) == 10L), r)
    assert(r(20L) == 20L && r(21L) == 20L, r)
    assert(r.size == 10)
    graft.analytics.Caches.clear()
  }

  test("dedupClustersAlternating equals dedupClusters on mixed graphs and " +
    "handles a 120-deep chain the propagation default cap cannot") {
    // mixed: chain + clique + pair + a degenerate SELF-pair (both
    // engines must emit (30, 30) — 'every doc appearing in a pair')
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L), (30L, 30L)).toDF("a_id", "b_id")
    val alt = Dedup.dedupClustersAlternating(pairs, col("a_id"), col("b_id"))
      .as[(Long, Long)].collect().toMap
    val prop = Dedup.dedupClusters(pairs, col("a_id"), col("b_id"))
      .as[(Long, Long)].collect().toMap
    assert(alt == prop, s"alternating vs propagation: $alt vs $prop")

    // random graph equality (fixed seed): 60 nodes, 80 random edges
    val rnd = new scala.util.Random(5)
    val rpairs = (0 until 80)
      .map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(p => p._1 != p._2).toDF("a_id", "b_id")
    val altR = Dedup.dedupClustersAlternating(rpairs, col("a_id"),
      col("b_id")).as[(Long, Long)].collect().toMap
    val propR = Dedup.dedupClusters(rpairs, col("a_id"), col("b_id"),
      maxIters = 60).as[(Long, Long)].collect().toMap
    assert(altR == propR, s"random graph mismatch")
    // third, independent oracle: plain union-find over the same edges
    val edges = rpairs.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val uf = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(x => x -> find(x)).toMap
    assert(altR == uf, s"union-find disagrees: $altR vs $uf")

    // a 120-edge chain has diameter 120: min-label propagation moves one
    // hop per round, so the default 25-round cap CANNOT converge it —
    // the O(log n) star contraction labels every node 0 well inside its
    // default cap
    val chain = (0L until 120L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val deep = Dedup.dedupClustersAlternating(chain, col("a_id"),
      col("b_id")).as[(Long, Long)].collect().toMap
    assert(deep.size == 121 && deep.values.forall(_ == 0L),
      s"chain must collapse to component 0: ${deep.toSeq.sortBy(_._1).take(8)}")
    graft.analytics.Caches.clear()
  }

  test("both clustering engines RAISE on maxIters exhaustion instead of " +
    "returning part-converged labels") {
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    // diameter 30 > default 25 propagation rounds: pre-fix this silently
    // returned labels that had only moved 25 hops
    val e1 = intercept[IllegalStateException] {
      Dedup.dedupClusters(chain, col("a_id"), col("b_id"))
        .as[(Long, Long)].collect()
    }
    assert(e1.getMessage.contains("did not converge"), e1.getMessage)
    val e2 = intercept[IllegalStateException] {
      Dedup.dedupClustersAlternating(chain, col("a_id"), col("b_id"),
        maxIters = 1).as[(Long, Long)].collect()
    }
    assert(e2.getMessage.contains("did not converge"), e2.getMessage)
    // ...and a raised cap converges the same chain fine
    val ok = Dedup.dedupClusters(chain, col("a_id"), col("b_id"),
      maxIters = 40).as[(Long, Long)].collect().toMap
    assert(ok.size == 31 && ok.values.forall(_ == 0L))
    graft.analytics.Caches.clear()
  }

  test("newAgainstBloom equals newAgainst exactly, even with a high-fpp " +
    "sketch — false positives are rescued by the verify join") {
    val all = graft.Tables.load(spark, sf0001, "documents")
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
    val hist = all.filter(col("doc_id") % 7 =!= 0)
    val batch = all.filter(col("doc_id") % 7 === 0)
    val want = Dedup.newAgainst(hist, batch, col("doc_id"), col("fp"))
      .as[Long].collect().sorted.toSeq
    assert(want.nonEmpty)
    for (fpp <- Seq(0.03, 0.5)) {
      val got = Dedup.newAgainstBloom(hist, batch, col("doc_id"),
          col("fp"), expectedItems = 1000L, fpp = fpp)
        .as[Long].collect().sorted.toSeq
      assert(got == want, s"fpp=$fpp: $got vs $want")
    }
    // undersized sketch (expected << actual): saturates toward all-
    // positive — still exact, just fewer prefilter wins
    val tiny = Dedup.newAgainstBloom(hist, batch, col("doc_id"),
        col("fp"), expectedItems = 2L, fpp = 0.5)
      .as[Long].collect().sorted.toSeq
    assert(tiny == want, s"undersized sketch changed the answer")
    // EMPTY history folds to a NULL sketch; might_contain(null, _) is
    // null — without the coalesce guard both branches would drop every
    // batch row (bootstrap of a fresh lake = total data loss)
    val emptyHist = Seq.empty[(Long, String)].toDF("doc_id", "fp")
    val boot = Dedup.newAgainstBloom(emptyHist,
        Seq((1L, "a"), (2L, "b")).toDF("doc_id", "fp"),
        col("doc_id"), col("fp"), expectedItems = 100L)
      .as[Long].collect().sorted.toSeq
    assert(boot == Seq(1L, 2L), s"empty history must keep everything: $boot")
    // sizing refuses the session's silent bloom clamp (default 4M items /
    // 64Mbit): a 100M-key request would saturate into a non-filtering
    // sketch
    val big = intercept[IllegalArgumentException] {
      Dedup.newAgainstBloom(hist, batch, col("doc_id"), col("fp"),
        expectedItems = 100000000L)
    }
    assert(big.getMessage.contains("maxNumBits"), big.getMessage)
  }

  test("substringDedup equals a brute-force reference on random tiny-" +
    "vocabulary corpora (duplicated spans arise by the birthday bound)") {
    val k = 3
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      // "b" and "B" are the SAME token for matching (case-insensitive)
      // but distinct bytes in the reassembled output
      val vocab = Vector("a", "b", "B")
      val docs = (1L to 12L).map { id =>
        val n = rnd.nextInt(25) + 1
        (id, Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // reference: count LOWERCASED k-shingles (case-insensitive match),
      // flag covered positions, reassemble from the RAW tokens — the
      // definition, executed naively
      val tokd = docs.map { case (id, t) =>
        id -> t.split(" ", -1).toVector }
      val counts = scala.collection.mutable.Map[Seq[String], Int]()
        .withDefaultValue(0)
      for ((_, ts) <- tokd; i <- 0 to ts.length - k)
        counts(ts.slice(i, i + k).map(_.toLowerCase)) += 1
      val want = tokd.map { case (id, ts) =>
        val dupStart = (0 to ts.length - k)
          .filter(i => counts(ts.slice(i, i + k).map(_.toLowerCase)) >= 2)
          .toSet
        val covered = ts.indices
          .map(p => (math.max(0, p - k + 1) to p).exists(dupStart))
        val kept = ts.zipWithIndex.collect {
          case (t, i) if !covered(i) => t }
        id -> ((ts.length.toLong, kept.length.toLong, kept.mkString(" ")))
      }.toMap
      val got = Dedup.substringDedup(docs.toDF("doc_id", "text"),
          col("doc_id"), col("text"), k)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got == want, s"seed $seed:\ngot:  $got\nwant: $want")
    }
  }

  test("substringCleanAgainst drops history-known spans only — batch-" +
    "internal duplication passes through (that is substringDedup's job)") {
    def words(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val span = words("h", 4)
    val history = Seq((100L, s"${words("x", 3)} $span ${words("y", 3)}"))
      .toDF("doc_id", "text")
    val hh = Dedup.substringHistoryHashes(history, col("text"), k = 4)
    val internal = words("z", 4) // duplicated WITHIN the batch only
    val batch = Seq(
      // the history span arrives UPPERCASED: matching is case-insensitive
      (1L, s"${words("a", 3)} ${span.toUpperCase} ${words("b", 3)}"),
      (2L, s"$internal ${words("c", 3)} $internal"),    // internal dup
      (3L, s"MiXeD ${words("u", 7)}")                   // novel, mixed case
    ).toDF("doc_id", "text")
    val r = Dedup.substringCleanAgainst(batch, col("doc_id"), col("text"),
        hh, k = 4)
      .as[(Long, Long, Long, String)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    assert(r(1L) == ((10L, 6L, s"${words("a", 3)} ${words("b", 3)}")), r(1L))
    assert(r(2L)._3 == s"$internal ${words("c", 3)} $internal",
      s"batch-internal dup must survive the incremental clean: ${r(2L)}")
    assert(r(3L) == ((8L, 8L, s"MiXeD ${words("u", 7)}")),
      s"novel doc must keep its original bytes: ${r(3L)}")
  }

  test("sample_split_leakfree: no near-dup pair straddles a split " +
    "boundary, and unclustered docs keep sample_split's assignment") {
    val splits = graft.SparkEntry.queries("sample_split_leakfree")(spark, sf0001)
      .as[(Long, String)].collect().toMap
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val pairs = Dedup.jaccardPairs(docs, col("doc_id"), col("text"),
      n = 3, threshold = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
    for ((a, b) <- pairs)
      assert(splits(a) == splits(b),
        s"near-dup pair ($a, $b) split across ${splits(a)}/${splits(b)}")
    // a doc in no pair must bucket exactly like the naive split would
    val clustered = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val naive = docs.select(col("doc_id"),
        when(pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 15),
          16, 10).cast("long"), lit(10)) < 8, "train")
          .when(pmod(conv(substring(md5(col("doc_id").cast("string")), 1,
            15), 16, 10).cast("long"), lit(10)) === 8, "val")
          .otherwise("test").as("split"))
      .as[(Long, String)].collect().toMap
    for ((id, sp) <- splits if !clustered.contains(id))
      assert(naive(id) == sp, s"unclustered doc $id moved: $sp vs ${naive(id)}")
    graft.analytics.Caches.clear()
  }

  test("substringDedup removes cross-doc and within-doc duplicated spans, " +
    "keeps unique text intact") {
    def words(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val span = words("dup", 5) // the duplicated passage, length = k
    val fixture = Seq(
      (1L, s"${words("a", 4)} $span ${words("b", 4)}"), // span + unique halo
      (2L, s"${words("c", 4)} $span ${words("e", 4)}"), // same span, other doc
      (3L, words("u", 12)),                             // fully unique
      (4L, s"$span ${words("f", 3)} $span")             // twice in ONE doc
    ).toDF("doc_id", "text")
    val r = Dedup.substringDedup(fixture, col("doc_id"), col("text"), k = 5)
      .as[(Long, Long, Long, String)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    // docs 1/2: the 5-token span vanishes, both 4-token halos survive
    assert(r(1L) == ((13L, 8L, s"${words("a", 4)} ${words("b", 4)}")), r(1L))
    assert(r(2L) == ((13L, 8L, s"${words("c", 4)} ${words("e", 4)}")), r(2L))
    // doc 3: no duplicated shingle anywhere — byte-identical passthrough
    assert(r(3L) == ((12L, 12L, words("u", 12))), r(3L))
    // doc 4: BOTH occurrences of the span drop (self-duplication counts)
    // while the middle filler — which no duplicated shingle covers —
    // survives exactly
    assert(r(4L) == ((13L, 3L, words("f", 3))), r(4L))
  }

  test("cdc: chunks partition the token stream, and a prefix edit " +
    "realigns after a bounded window (the content-defined property)") {
    // deterministic varied token stream — enough tokens for ~15 chunks
    // at maskBits=3 (expected chunk length 8)
    val toks = (0 until 120).map(i => s"w${(i * 2654435761L) % 97}")
    val t1 = toks.mkString(" ")
    val t2 = "zzz qqq xxx " + t1 // 3-token prefix insertion
    val df = Seq((1L, t1), (2L, t2)).toDF("id", "t")
    val ch = Dedup.cdcChunks(df, col("id"), col("t"), w = 4, maskBits = 3)
      .cache()
    // chunks PARTITION the tokens: per-doc chunk token counts sum to the
    // doc's token count, with no overlap possible by construction
    val sums = ch.groupBy("doc_id").agg(sum("n_tokens").as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sums == Map(1L -> 120L, 2L -> 123L), sums)
    // a fixed-size chunker would shift EVERY block after the insertion;
    // CDC boundaries depend only on a w-token window, so every doc-1
    // chunk after the first post-edit boundary reappears verbatim in
    // doc 2 — only the chunk containing the edit may differ
    val f1 = ch.filter($"doc_id" === 1).select("chunk_fp")
      .as[String].collect()
    val f2 = ch.filter($"doc_id" === 2).select("chunk_fp")
      .as[String].collect().toSet
    assert(f1.length >= 8, s"degenerate fixture: ${f1.length} chunks")
    val missing = f1.count(!f2.contains(_))
    assert(missing <= 1,
      s"$missing of ${f1.length} doc-1 chunks lost after a prefix edit")
    // and the duplicate accounting sees exactly that sharing
    val stats = Dedup.cdcDedupStats(df, col("id"), col("t"),
      w = 4, maskBits = 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    assert(stats(1L)._2 >= f1.length - 1, stats(1L))

    // the chunk-store ingest view of the same edit: almost everything
    // in the edited doc is already stored; a fresh doc matches nothing
    val hist = Dedup.cdcHistoryFps(df.filter($"id" === 1),
      col("id"), col("t"), w = 4, maskBits = 3)
    val fresh = (0 until 60).map(i => s"q${(i * 40503L) % 89}")
      .mkString(" ")
    val incoming = Seq((2L, t2), (3L, fresh)).toDF("id", "t")
    val nw = Dedup.cdcNewChunks(hist, incoming, col("id"), col("t"),
      w = 4, maskBits = 3)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4, x._5))).toMap
    assert(nw(2L)._2 >= nw(2L)._1 - 2,
      s"edited doc should be mostly known to the store: ${nw(2L)}")
    assert(nw(3L)._2 == 0 && nw(3L)._3 == 60 && nw(3L)._4 == 60,
      s"fresh doc should be all-new: ${nw(3L)}")
    // the gate view of the same store: the edited near-copy drops, the
    // fresh doc passes
    val kept = graft.streaming.Gates.cdcFreshness(hist, "id", "t",
      minNewFrac = 0.5, w = 4, maskBits = 3)(incoming)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(3L), s"gate kept $kept")
    ch.unpersist()
  }
}
