package graft.analytics

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf0001, "embeddings").cache()
  private lazy val queries = emb.filter(col("vec_id") % 50 === 0)

  test("cosine of a vector with itself is 1") {
    val self = Similarity.cosinePairs(
      emb.limit(1).union(emb.limit(1))
        .withColumn("vec_id", monotonically_increasing_id()),
      col("vec_id"), col("embedding"))
    val sims = self.as[(Long, Long, Double)].collect()
    assert(sims.length == 1 && math.abs(sims.head._3 - 1.0) < 1e-9)
  }

  test("brute-force top-k returns k ranked neighbors per query") {
    val r = Similarity.bruteForceTopK(queries, emb, col("vec_id"),
      col("embedding"), col("vec_id"), col("embedding"), k = 5)
    val byQ = r.as[(Long, Long, Double, Int)].collect().groupBy(_._1)
    assert(byQ.values.forall(_.length == 5))
    // ranks are 1..5 with non-increasing sim
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to 5))
      assert(sorted.map(_._3).sliding(2).forall(p => p.head >= p.last))
    }
  }

  test("IVF-SQ8 probing all lists equals the int8 brute force — list " +
    "pruning composes with quantization losslessly") {
    val k = 10
    val bf = Similarity.int8TopK(queries, emb, col("vec_id"),
      col("embedding"), col("vec_id"), col("embedding"), k)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val full = Similarity.ivfSq8TopK(queries, emb, col("vec_id"),
      col("embedding"), col("vec_id"), col("embedding"), k,
      nLists = 16, nProbe = 16)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(full == bf)
  }

  test("IVF probing all lists equals brute force; partial probe trades " +
    "recall for a 4/16 scan fraction") {
    val k = 10
    val bf = Similarity.bruteForceTopK(queries, emb, col("vec_id"),
      col("embedding"), col("vec_id"), col("embedding"), k)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    // nProbe = nLists covers every inverted list → must be exact
    val full = Similarity.ivfTopK(queries, emb, col("vec_id"),
      col("embedding"), col("vec_id"), col("embedding"), k,
      nLists = 16, nProbe = 16)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(full == bf)
    // partial probe: recall floor on sf0.001's near-isotropic vectors
    // (scans ~1/4 of the corpus; measured ~0.44 here — real ANN tradeoff)
    val ivf = Similarity.ivfTopK(queries, emb, col("vec_id"),
      col("embedding"), col("vec_id"), col("embedding"), k,
      nLists = 16, nProbe = 4)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.3, s"IVF recall $recall too low")
  }

  test("SRP top-k recall vs brute force on near-isotropic vectors") {
    val k = 10
    val bf = Similarity.bruteForceTopK(queries, emb, col("vec_id"),
      col("embedding"), col("vec_id"), col("embedding"), k)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val srp = Similarity.srpTopK(queries, emb, col("vec_id"),
      col("embedding"), col("vec_id"), col("embedding"), k)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect srp).size.toDouble / bf.size
    assert(recall >= 0.5, s"SRP top-k recall $recall too low")
  }

  test("multi-probe SRP: recall >= single-probe at identical bands/bits " +
    "(probe 0 is the base bucket, so candidates are a superset) and " +
    "flips=0 degenerates to exactly srpTopK") {
    val k = 10
    val bf = Similarity.bruteForceTopK(queries, emb, col("vec_id"),
      col("embedding"), col("vec_id"), col("embedding"), k)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame) = {
      val s = df.select("q_id", "n_id").as[(Long, Long)].collect().toSet
      (bf intersect s).size.toDouble / bf.size
    }
    val single = Similarity.srpTopK(queries, emb, col("vec_id"),
      col("embedding"), col("vec_id"), col("embedding"), k)
    val multi = Similarity.srpMultiProbeTopK(queries, emb, col("vec_id"),
      col("embedding"), col("vec_id"), col("embedding"), k, flips = 2)
    val (rs, rm) = (recallOf(single), recallOf(multi))
    assert(rm >= rs,
      s"multi-probe recall $rm must not drop below single-probe $rs")
    // flips=0 emits only the base bucket per band — identical result set
    val zero = Similarity.srpMultiProbeTopK(queries, emb, col("vec_id"),
      col("embedding"), col("vec_id"), col("embedding"), k, flips = 0)
      .select("q_id", "n_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val base = single.select("q_id", "n_id", "sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(zero == base, "flips=0 must equal srpTopK exactly")
  }

  test("int8-quantized top-k: high recall vs the float baseline, and " +
    "quantized values stay in [-127, 127]") {
    val k = 10
    val bf = Similarity.bruteForceTopK(queries, emb, col("vec_id"),
      col("embedding"), col("vec_id"), col("embedding"), k)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val q8 = Similarity.int8TopK(queries, emb, col("vec_id"),
      col("embedding"), col("vec_id"), col("embedding"), k)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect q8).size.toDouble / bf.size
    assert(recall >= 0.9, s"int8 top-k recall $recall too low")
    val bounds = emb.select(Similarity.quantizeInt8(
      col("embedding").cast("array<double>")).as("q"))
      .select(explode(col("q")).as("v"))
      .agg(min(col("v")), max(col("v"))).as[(Long, Long)].head()
    assert(bounds._1 >= -127 && bounds._2 <= 127, bounds)
  }

  test("SRP-LSH pairs equal the exhaustive cosinePairs result on planted " +
    "near-dups (full recall, exact precision)") {
    // 40 base vectors each with a planted near-dup (cosine ~0.97-0.995)
    // plus 200 random fillers; fixed seed => deterministic.
    val rnd = new scala.util.Random(42)
    def gauss(dim: Int): Array[Double] = Array.fill(dim)(rnd.nextGaussian())
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Array[Double])]()
    var id = 0L
    (0 until 40).foreach { i =>
      val base = gauss(64)
      val eps = 0.12 + 0.015 * (i % 10) // cosine ≈ 0.95..0.99
      val noise = gauss(64)
      val dup = base.zip(noise).map { case (b, n) => b + eps * n }
      rows += ((id, base)); rows += ((id + 1, dup)); id += 2
    }
    (0 until 200).foreach { _ => rows += ((id, gauss(64))); id += 1 }
    val df = spark.createDataFrame(rows.toSeq.map { case (i, v) =>
      (i, v.map(_.toFloat))
    }).toDF("vec_id", "embedding")

    val exact = Similarity.cosinePairs(df, col("vec_id"), col("embedding"))
      .filter(col("sim") >= 0.95)
      .as[(Long, Long, Double)].collect().toSet
    val lsh = Similarity.srpLshPairs(df, col("vec_id"), col("embedding"),
      threshold = 0.95)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty, "test data planted no pairs — raise eps range")
    assert(lsh == exact,
      s"missed=${(exact -- lsh).size} extra=${(lsh -- exact).size} of ${exact.size}")
    graft.analytics.Caches.clear()
  }

  test("incremental SRP-LSH (srpLshPairsAgainst) finds every planted dup " +
    "of the history in the incoming batch — full recall, exact precision, " +
    "no history self-pairs") {
    val rnd = new scala.util.Random(7)
    def gauss(dim: Int): Array[Double] = Array.fill(dim)(rnd.nextGaussian())
    // history: 30 bases + 150 fillers; incoming: a near-dup per base
    // (cosine ~0.95-0.99) + 50 genuinely new vectors
    val hist = scala.collection.mutable.ArrayBuffer[(Long, Array[Double])]()
    val inc = scala.collection.mutable.ArrayBuffer[(Long, Array[Double])]()
    (0 until 30).foreach { i =>
      val base = gauss(64)
      hist += ((i.toLong, base))
      val eps = 0.12 + 0.015 * (i % 10)
      inc += ((1000L + i, base.zip(gauss(64)).map { case (b, n) => b + eps * n }))
    }
    (0 until 150).foreach(i => hist += ((100L + i, gauss(64))))
    (0 until 50).foreach(i => inc += ((2000L + i, gauss(64))))
    def toDf(rows: Seq[(Long, Array[Double])]) =
      spark.createDataFrame(rows.map { case (i, v) => (i, v.map(_.toFloat)) })
        .toDF("vec_id", "embedding")
    val h = toDf(hist.toSeq)
    val in = toDf(inc.toSeq)

    // exhaustive cross-set reference
    val hv = h.select(col("vec_id").as("dup_of"),
      col("embedding").cast("array<double>").as("h_v"))
    val iv = in.select(col("vec_id").as("new_id"),
      col("embedding").cast("array<double>").as("i_v"))
    val exact = iv.crossJoin(hv)
      .select(col("new_id"), col("dup_of"),
        round(Similarity.cosine(col("i_v"), col("h_v")), 4).as("sim"))
      .filter(col("sim") >= 0.9)
      .as[(Long, Long, Double)].collect().toSet

    val got = Similarity.srpLshPairsAgainst(h, in, col("vec_id"),
      col("embedding"), threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.size >= 25, s"planted too few pairs: ${exact.size}")
    assert(got == exact,
      s"missed=${(exact -- got).size} extra=${(got -- exact).size} of ${exact.size}")
    // direction contract: every pair is (incoming, history)
    assert(got.forall { case (n, d, _) => n >= 1000L && d < 1000L })
    graft.analytics.Caches.clear()
  }

  test("SRP-LSH on the real embeddings table matches the exhaustive " +
    "result (empty at this SF — zero false positives)") {
    val exact = Similarity.cosinePairs(emb, col("vec_id"), col("embedding"))
      .filter(col("sim") >= 0.95).count()
    val lsh = Similarity.srpLshPairs(emb, col("vec_id"), col("embedding"),
      threshold = 0.95).count()
    assert(exact == 0 && lsh == 0)
    graft.analytics.Caches.clear()
  }

  test("PQ-ADC top-k: k ranked neighbors per query, nonnegative " +
    "non-decreasing approximate distances, and recall above the floor a " +
    "16-codeword shared codebook can honestly deliver") {
    val k = 10
    val pq = Similarity.pqTopK(queries, emb, col("vec_id"),
      col("embedding"), col("vec_id"), col("embedding"), k)
    val rows = pq.as[(Long, Long, Double, Int)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.values.forall(_.length == k))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to k))
      assert(sorted.map(_._3).forall(_ >= 0.0), "squared ADC distance")
      assert(sorted.map(_._3).sliding(2).forall(p => p.head <= p.last))
    }
    // L2-ADC vs cosine ranking agree only loosely on near-isotropic
    // vectors with an untrained codebook — assert a modest floor; the
    // exactness story is the DuckDB oracle, not recall
    val bf = Similarity.bruteForceTopK(queries, emb, col("vec_id"),
      col("embedding"), col("vec_id"), col("embedding"), k)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect
      rows.map(r => (r._1, r._2)).toSet).size.toDouble / bf.size
    assert(recall >= 0.05, s"PQ recall $recall collapsed to noise")
  }

  test("IVF-PQ returns k ranked candidates per query drawn from probed " +
    "lists, and its candidate sets are a subset of plain PQ's universe") {
    val k = 5
    val ivfpq = Similarity.ivfPqTopK(queries, emb, col("vec_id"),
      col("embedding"), col("vec_id"), col("embedding"), k)
      .as[(Long, Long, Double, Int)].collect()
    val byQ = ivfpq.groupBy(_._1)
    // every query answered with k ranked rows, distances non-decreasing
    assert(byQ.values.forall(_.length == k))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to k))
      assert(sorted.map(_._3).sliding(2).forall(p => p.head <= p.last))
    }
    // pruning consistency: IVF-PQ's (q, n, adist) agree with the
    // unpruned PQ ADC distance for the same pair — the composition
    // changes WHICH pairs are scanned, never the score of a pair
    val pq = Similarity.pqTopK(queries, emb, col("vec_id"),
      col("embedding"), col("vec_id"), col("embedding"), k = 1000)
      .select("q_id", "n_id", "adist")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, d) => (q, n) -> d }.toMap
    ivfpq.foreach { case (q, n, d, _) =>
      assert(pq.get((q, n)).forall(_ == d),
        s"ADC distance mismatch for ($q,$n): ivfpq=$d pq=${pq.get((q, n))}")
    }
  }

  test("pcaFit: components are orthonormal eigenpairs of the covariance, " +
    "eigenvalues descend, and projection variance matches them") {
    val emb = graft.Tables.load(spark, sf0001, "embeddings")
    val k = 8
    val model = Similarity.pcaFit(emb, col("embedding"), k)
    val d = model.mean.length
    assert(model.components.length == k && model.components.forall(_.length == d))
    // orthonormal: W Wt = I on the kept components
    for (i <- 0 until k; j <- i until k) {
      val dp = model.components(i).zip(model.components(j))
        .map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dp - want) < 1e-9, s"w${i}.w${j} = $dp")
    }
    // eigenpair residual against the independently-computed covariance
    val cov = Array.ofDim[Double](d, d)
    Similarity.pcaCov(emb, col("embedding"), decimals = 12)
      .as[(Int, Int, Double)].collect()
      .foreach { case (i, j, c) => cov(i)(j) = c; cov(j)(i) = c }
    for (c <- 0 until k) {
      val w = model.components(c); val l = model.eigenvalues(c)
      val res = (0 until d).map { r =>
        val cw = (0 until d).map(x => cov(r)(x) * w(x)).sum
        math.abs(cw - l * w(r))
      }.max
      assert(res < 1e-6, s"eigen residual $res for component $c (λ=$l)")
    }
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1)),
      s"eigenvalues must descend: ${model.eigenvalues.toSeq}")
    assert(model.eigenvalues.forall(_ >= -1e-12),
      "covariance eigenvalues cannot be negative")
    // empirical variance of each projected coordinate = its eigenvalue
    val proj = emb.select(
        Similarity.pcaProject(col("embedding"), model, decimals = 9).as("pc"))
      .as[Seq[Double]].collect()
    val n = proj.length.toDouble
    for (c <- 0 until k) {
      val xs = proj.map(_(c))
      val mu = xs.sum / n
      val va = xs.map(x => (x - mu) * (x - mu)).sum / n
      assert(math.abs(va - model.eigenvalues(c)) < 1e-6,
        s"projected variance $va vs eigenvalue ${model.eigenvalues(c)}")
    }
    // scale-invariance of the eigensolver: shrinking every vector by 1e-4
    // shrinks eigenvalues by 1e-8 but must leave the components intact —
    // an ABSOLUTE convergence threshold would bail before any rotation on
    // the tiny covariance and hand back coordinate axes
    val scaled = emb.select(transform(col("embedding"),
      x => x * lit(1e-4f)).as("embedding"))
    val m2 = Similarity.pcaFit(scaled, col("embedding"), k)
    val lr = m2.eigenvalues(0) / model.eigenvalues(0)
    assert(math.abs(lr - 1e-8) < 1e-10, s"eigenvalue scaling ratio $lr")
    val align = model.components(0).zip(m2.components(0))
      .map { case (a, b) => a * b }.sum
    assert(align > 0.999,
      s"top component must survive rescaling; alignment $align")
    // whitening: every output axis lands at unit variance
    val wproj = emb.select(Similarity.pcaProject(col("embedding"), model,
        decimals = 9, whiten = true).as("pc"))
      .as[Seq[Double]].collect()
    for (c <- 0 until k) {
      val xs = wproj.map(_(c))
      val mu = xs.sum / n
      val va = xs.map(x => (x - mu) * (x - mu)).sum / n
      assert(math.abs(va - 1.0) < 1e-4,
        s"whitened variance $va on component $c")
    }
  }

  test("graphTopK walks the neighbor chain to a target no entry point " +
    "can see directly, and ranks by (sim desc, id)") {
    import spark.implicits._
    // unit vectors fanned over a quarter circle: node i at angle i·10°.
    // Edges: the 1-NN chain i -> i+1 (symmetrized inside). The query
    // sits at node 9's angle — entries are hubs of the chain interior,
    // so only multi-hop traversal can reach the true best node.
    def vec(deg: Int): Array[Float] = {
      val r = math.toRadians(deg.toDouble)
      Array(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val corpus = (0 to 9).map(i => (i.toLong, vec(i * 10))).toDF("id", "v")
    val edges = (0 to 8).map(i => (i.toLong, i + 1L)).toDF("src", "dst")
    val query = Seq((100L, vec(90))).toDF("id", "v")
    val r = Similarity.graphTopK(query, corpus, edges, col("id"),
      col("v"), col("id"), col("v"), col("src"), col("dst"),
      k = 3, beam = 2, hops = 9, entries = 2)
      .orderBy(col("rank")).as[(Long, Long, Double, Int)].collect()
    assert(r.map(_._2).toSeq == Seq(9L, 8L, 7L),
      s"must reach the far end of the chain in rank order: ${r.toSeq}")
    assert(r.head._3 == 1.0, s"cos(90°,90°) must be 1: ${r.head}")
    Caches.clear()
  }

  test("rpProject: the JL sign matrix is balanced, the projection is " +
    "exactly linear, and norms are preserved within JL distortion") {
    // balance: each of the 8 sign rows must be near 50/50 over 64 dims
    // (a constant-sign row would make that output dim just a scaled sum
    // — exactly what an LCG parity produced before the md5 derivation)
    (0 until 8).foreach { j =>
      val pos = (1 to 64).count(i => Similarity.rpSign(i, j) > 0)
      assert(pos >= 20 && pos <= 44, s"row $j unbalanced: $pos/64 positive")
    }
    // near-orthogonality: correlated rows collapse the effective output
    // dimension (the mod-103 LCG parity hit 56/64 alignment)
    val rows = (0 until 8).map(j =>
      (1 to 64).map(i => Similarity.rpSign(i, j)))
    for (a <- 0 until 8; b <- (a + 1) until 8) {
      val d = rows(a).zip(rows(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(d) <= 20.0, s"rows $a,$b aligned: dot $d")
    }
    // exact linearity: rpProject(2x) == 2 * rpProject(x) for a vector of
    // exactly-representable halves (no rounding slack needed)
    val x = Array.tabulate(64)(i => ((i % 7) - 3).toFloat / 2f)
    val df = Seq((1L, x), (2L, x.map(_ * 2f))).toDF("id", "v")
    val p = df.select(col("id"),
        Similarity.rpProject(col("v"), 64, 8, decimals = 9).as("p"))
      .orderBy(col("id")).as[(Long, Seq[Double])].collect()
    assert(p(1)._2 == p(0)._2.map(_ * 2.0),
      s"not linear: ${p(0)._2} vs ${p(1)._2}")
    // norm preservation on deterministic md5-derived pseudo-random
    // vectors: ||Rx||/√k must straddle 1 within the (wide, k=8) JL
    // distortion band
    def h32(s: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16).toDouble /
        0xffffffffL.toDouble * 2.0 - 1.0
    }
    val vs = (0 until 40).map { s =>
      (s.toLong, Array.tabulate(64)(i => h32(s"$s:${i + 1}").toFloat))
    }.toDF("id", "v")
    val ratios = vs.select(
        (sqrt(aggregate(Similarity.rpProject(col("v"), 64, 8, 9),
          lit(0.0), (a, c) => a + c * c)) /
          (sqrt(lit(8.0)) *
            Similarity.norm(col("v").cast("array<double>"))))
          .as("r"))
      .as[Double].collect()
    assert(ratios.forall(r => r > 0.4 && r < 1.6),
      s"JL distortion blown: ${ratios.min} .. ${ratios.max}")
    val mean = ratios.sum / ratios.length
    assert(mean > 0.8 && mean < 1.1, s"ratio mean drifted: $mean")
  }
}
