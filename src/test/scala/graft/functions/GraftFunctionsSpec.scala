package graft.functions

import graft.SparkSuite
import graft.analytics.{Dedup, Skew, TextAnalysis}
import org.apache.spark.sql.functions._

class GraftFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("custom expressions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    Seq(("a b c d e"), ("x y z")).toDF("text").createOrReplaceTempView("t")
    val r = spark.sql(
      """SELECT simhash64(split(text, ' ')) AS sh,
        |  word_shingles(text, 3) AS ws,
        |  minhash_signature(word_shingles(text, 3), 8) AS sig,
        |  hashed_bow_logit(text) AS logit
        |FROM t""".stripMargin).collect()
    assert(r.length == 2)
    assert(r.forall(_.getAs[Long]("sh") != 0L))
    assert(r.head.getSeq[String](1).contains("a b c"))
    assert(r.forall(_.getSeq[Long](2).length == 8))
    assert(r.forall(row => math.abs(row.getAs[Double]("logit")) <= 0.5))
  }

  test("SQL zorder2 agrees with the row-at-a-time reference") {
    GraftFunctions.register(spark)
    Seq((3L, 5L), (1023L, 0L), (0L, 1023L)).toDF("x", "y")
      .createOrReplaceTempView("tz")
    val got = spark.sql("SELECT x, y, zorder2(x, y) AS z FROM tz")
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == ZOrder.zorder2Ref(x, y), s"x=$x y=$y")
    }
  }

  test("SQL word_shingles agrees with the Column API") {
    GraftFunctions.register(spark)
    Seq("the quick brown fox jumps").toDF("text").createOrReplaceTempView("t2")
    val sql = spark.sql("SELECT word_shingles(lower(text), 3) AS s FROM t2")
      .head.getSeq[String](0)
    val api = Seq("the quick brown fox jumps").toDF("text")
      .select(TextAnalysis.shingles(col("text"), 3).as("s"))
      .head.getSeq[String](0)
    assert(sql == api)
  }

  test("native dot_product is bit-identical to the composed " +
    "aggregate(zip_with) fold, and null-safe on length mismatch") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map(_ =>
      (Seq.fill(64)(rnd.nextDouble()), Seq.fill(64)(rnd.nextDouble())))
    val df = rows.toDF("a", "b")
    val native = df.select(
      HashExpressions.dotProduct(col("a"), col("b")).as("d"))
      .as[Double].collect()
    val composed = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("d"))
      .as[Double].collect()
    assert(native.zip(composed).forall { case (n, c) =>
      java.lang.Double.doubleToLongBits(n) ==
        java.lang.Double.doubleToLongBits(c)
    })
    val mismatch = Seq((Seq(1.0, 2.0), Seq(1.0)))
      .toDF("a", "b")
      .select(HashExpressions.dotProduct(col("a"), col("b")).as("d"))
      .collect()
    assert(mismatch.head.isNullAt(0))
    // float arrays (the embedding storage type) implicit-cast like the
    // composed fold did
    val f = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
      .select(HashExpressions.dotProduct(col("a"), col("b")).as("d"))
      .as[Double].head()
    assert(f == 11.0)
  }

  test("multiple dot_products in one codegen scope compile — the cosine " +
    "and PQ distance shapes never fall back to interpreted mode") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{Add, BoundReference, Divide, Literal, Multiply, Sqrt}
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val at = ArrayType(DoubleType, containsNull = false)
    val a = BoundReference(0, at, nullable = false)
    val b = BoundReference(1, at, nullable = false)
    // pqD2 = dot(a,a) + dot(b,b) - 2*dot(a,b): three DotProducts in scope
    val pq = Add(Add(DotProduct(a, a), DotProduct(b, b)),
      Multiply(Literal(-2.0), DotProduct(a, b)))
    // cosine = dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))): three more
    val cos = Divide(DotProduct(a, b),
      Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
    // Six DotProducts in ONE generated scope. generate() throws on janino
    // failure instead of silently falling back — this line IS the
    // regression assertion for the fixed-local-name collision.
    val proj = GenerateUnsafeProjection.generate(Seq(pq, cos))
    val av = Array(1.0, 2.0, 3.0)
    val bv = Array(4.0, 5.0, 6.0)
    val row = InternalRow(ArrayData.toArrayData(av), ArrayData.toArrayData(bv))
    val out = proj(row)
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (p, q) => p * q }.sum
    val expPq = dot(av, av) + dot(bv, bv) - 2.0 * dot(av, bv)
    val expCos = dot(av, bv) / (math.sqrt(dot(av, av)) * math.sqrt(dot(bv, bv)))
    assert(out.getDouble(0) == expPq)
    assert(math.abs(out.getDouble(1) - expCos) < 1e-15)
    // null propagation survives the inline loop: length mismatch -> null
    val projN = GenerateUnsafeProjection.generate(Seq(DotProduct(
      BoundReference(0, at, nullable = false),
      BoundReference(1, at, nullable = false))))
    val outN = projN(InternalRow(
      ArrayData.toArrayData(Array(1.0, 2.0)),
      ArrayData.toArrayData(Array(1.0))))
    assert(outN.isNullAt(0))
  }

  test("native hashed_bow_logit is bit-identical to the composed " +
    "aggregate(transform) form on corpus text and edge strings") {
    val corpus = graft.Tables.load(spark, sf0001, "documents")
      .select(col("text"))
      .unionAll(Seq("", "one", "a  b", " x ", "ümläut 中文 tok")
        .toDF("text"))
    val both = corpus.select(
      graft.analytics.TextAnalysis.classifierLogit(col("text")).as("n"),
      graft.analytics.TextAnalysis.classifierLogitComposed(col("text"))
        .as("c"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty)
    assert(both.forall { case (n, c) =>
      java.lang.Double.doubleToLongBits(n) ==
        java.lang.Double.doubleToLongBits(c)
    })
    // null text null-propagates in both forms
    val nulls = Seq[Option[String]](None).toDF("text").select(
      graft.analytics.TextAnalysis.classifierLogit(col("text")).as("n"),
      graft.analytics.TextAnalysis.classifierLogitComposed(col("text"))
        .as("c")).collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("native word_gram_hashes is bit-identical to the composed " +
    "ngrams + conv(substring(md5)) chain on corpus text and edges") {
    val corpus = graft.Tables.load(spark, sf0001, "documents")
      .select(col("text"))
      .union(Seq(Some("one two"), Some("one"), Some(""), None)
        .map(Tuple1(_)).toDF("text"))
    val both = corpus.select(
      HashExpressions.wordGramHashes(lower(col("text")), 3).as("n"),
      transform(TextAnalysis.ngrams(col("text"), 3),
        g => conv(substring(md5(g), 1, 15), 16, 10).cast("long")).as("c"))
      .collect()
    assert(both.length > 4)
    both.foreach { row =>
      if (row.isNullAt(0)) assert(row.isNullAt(1))
      else assert(row.getSeq[Long](0) == row.getSeq[Long](1))
    }
  }

  test("sorted_long_intersect_count equals size(array_intersect) on " +
    "sorted distinct arrays") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map { _ =>
      val a = Seq.fill(40)(rnd.nextLong() % 50).distinct.sorted
      val b = Seq.fill(40)(rnd.nextLong() % 50).distinct.sorted
      (a, b)
    } :+ ((Seq.empty[Long], Seq(1L, 2L)))
    val both = rows.toDF("a", "b").select(
      HashExpressions.sortedLongIntersectCount(col("a"), col("b")).as("n"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("c"))
      .as[(Long, Long)].collect()
    assert(both.forall { case (n, c) => n == c })
  }

  test("blocked containment equals the exact operator on a corpus whose " +
    "boilerplate run exceeds the df cap") {
    // the crossover-corpus shape from Bench: unique tokens + a planted
    // shared run per pair + corpus-wide boilerplate hotter than maxDf
    val docs = (0 until 60).map { k =>
      val uniq = (0 until 40).map(i => s"u${k}x$i").mkString(" ")
      val shared = (0 until 30).map(i => s"p${k / 2}x$i").mkString(" ")
      val boiler = (0 until 20).map(i => s"b$i").mkString(" ")
      val text = if (k % 2 == 0) s"$uniq $shared $boiler"
        else s"$shared $boiler"
      (s"d%03d".format(k), text)
    }.toDF("doc_id", "text")
    val exact = Dedup.containmentPairs(docs, col("doc_id"), col("text"),
      3, 0.8).collect().map(r => (r.getString(0), r.getString(1))).toSet
    val blocked = Dedup.containmentPairsBlocked(docs, col("doc_id"),
      col("text"), 3, 0.8, window = 4, maxDf = 16)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(exact.size == 30) // one sub→super direction per planted pair
    assert(blocked == exact)
  }

  test("salted join produces the same rows as a plain join, spread across " +
    "salts") {
    val large = (0L until 1000L).map(i => (if (i < 900) "hot" else s"k$i", i))
      .toDF("key", "v")
    val small = Seq(("hot", "H"), ("k950", "X")).toDF("key", "tag")
    val plain = large.join(small, Seq("key")).select("key", "v", "tag")
      .collect().toSet
    val salted = Skew.saltedJoin(large, small, "key", saltFactor = 8)
      .select("key", "v", "tag").collect().toSet
    assert(salted == plain)
  }

  test("wordpiece_segment: greedy longest match, position-split vocab, " +
    "per-char OOV, lossless round-trip") {
    val init = Seq("cust", "or", "the", "s", "t", "c", "d", "e", "o", "r")
    val cont = Seq("omer", "er", "d", "e", "o", "r", "y", "l", "m", "t")
    val seg = (w: String) =>
      Seq(Tuple1(w)).toDF("w")
        .select(BpeExpressions.wordpieceSegment(col("w"), init, cont))
        .as[Seq[String]].head()
    // longest match wins over a shorter prefix ('c'/'cu' would also fit)
    assert(seg("customer") == Seq("cust", "#omer"))
    // whole-word piece
    assert(seg("the") == Seq("the"))
    // the position decides the vocabulary: 'or' matches initially, then
    // continuation pieces take over
    assert(seg("order") == Seq("or", "#d", "#er"))
    // a character neither set covers consumes one marked OOV char at
    // either position
    assert(seg("xylo") == Seq("?x", "#y", "#l", "#o"))
    assert(seg("sax") == Seq("s", "#?a", "#?x"))
    // stripping markers and concatenating reconstructs the word exactly
    val words = Seq("customer", "order", "xylo", "sax", "the", "store")
    words.foreach { w =>
      val joined = seg(w).map(_.stripPrefix("#").stripPrefix("?")).mkString
      assert(joined == w, s"round-trip broke for $w")
    }
  }

  test("unigram_segment: DP-optimal vs exhaustive enumeration, greedy " +
    "trap avoided, longer-piece tie-break, per-char OOV round-trip") {
    val vocab: Seq[(String, Long)] = Seq(
      "a" -> -2300000L, "d" -> -2300000L, "e" -> -2300000L,
      "r" -> -2300000L, "t" -> -2300000L, "s" -> -2300000L,
      "da" -> -3000000L, "ta" -> -3000000L, "er" -> -4600000L,
      "st" -> -3400000L, "dat" -> -9000000L, "data" -> -5200000L,
      "ster" -> -5600000L)
    val oov = -12000000L
    val seg = (w: String) =>
      Seq(Tuple1(w)).toDF("w")
        .select(BpeExpressions.unigramSegment(col("w"), vocab, oov))
        .as[Seq[String]].head()
    val score = (pieces: Seq[String]) => pieces.map(p =>
      vocab.toMap.getOrElse(p, oov)).sum
    // exhaustive reference: best score over ALL segmentations (vocab
    // pieces + per-char OOV), ties to the longer FINAL piece first —
    // mirrors the engine's induction exactly
    val vmap = vocab.toMap
    def bestOf(w: String): (Long, List[String]) =
      if (w.isEmpty) (0L, Nil)
      else (1 to math.min(4, w.length)).reverse.flatMap { l =>
        val p = w.substring(w.length - l, w.length)
        val sc = vmap.get(p).orElse(
          if (l == 1) Some(oov) else None)
        sc.map { s =>
          val (ps, path) = bestOf(w.substring(0, w.length - l))
          (ps + s,
            path :+ (if (vmap.contains(p)) p else "?" + p))
        }
      }.maxBy(_._1) // stable: first max wins, and longer l comes first
    // the greedy trap: longest-prefix 'dat' scores terribly; the DP
    // must pick the whole-word piece
    assert(seg("data") == Seq("data"))
    // tie: 'er' == 'e'+'r' exactly; the longer final piece must win
    assert(seg("er") == Seq("er"))
    // OOV chars ('x' not in vocab) consume one marked char each
    assert(seg("tax") == Seq("ta", "?x"))
    // DP == exhaustive on a word mix (scores AND paths)
    Seq("data", "dater", "stater", "starts", "er", "tax", "xsdata",
      "dadata", "sterer", "tatada").foreach { w =>
      val got = seg(w)
      val (wantScore, wantPath) = bestOf(w)
      assert(score(got) == wantScore, s"suboptimal for $w: $got")
      assert(got == wantPath, s"tie-break diverged for $w: $got vs $wantPath")
      val joined = got.map(_.stripPrefix("?")).mkString
      assert(joined == w, s"round-trip broke for $w")
    }
  }
}
