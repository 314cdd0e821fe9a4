package graft.analytics

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf0001, "embeddings").cache()

  test("kmeans assigns every vector to one of <= k clusters, " +
    "deterministically") {
    val a = Clustering.kmeansAssign(emb, col("vec_id"), col("embedding"),
      k = 4, iters = 2)
    val rows = a.as[(Long, Long, Double)].collect()
    assert(rows.length == emb.count())
    assert(rows.map(_._1).distinct.length == rows.length) // one row per id
    assert(rows.map(_._2).distinct.length <= 4)
    val b = Clustering.kmeansAssign(emb, col("vec_id"), col("embedding"),
      k = 4, iters = 2).as[(Long, Long, Double)].collect()
    assert(rows.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq) // replay-stable
    Caches.clear()
  }

  test("k larger than the surviving seed sample degrades gracefully: " +
    "every vector still assigned, cluster count bounded by the sample") {
    val a = Clustering.kmeansAssign(emb, col("vec_id"), col("embedding"),
      k = 50, iters = 1) // sf0.001 has ~31 ids with hashRank < 64
    val rows = a.as[(Long, Long, Double)].collect()
    assert(rows.length == emb.count())
    val k = rows.map(_._2).distinct.length
    assert(k > 1 && k <= 50, s"clusters: $k")
    Caches.clear()
  }

  test("Lloyd iterations do not decrease mean cosine-to-centroid " +
    "(inertia improves or holds on this data)") {
    def meanSim(iters: Int): Double =
      Clustering.kmeansAssign(emb, col("vec_id"), col("embedding"),
        k = 4, iters = iters)
        .agg(avg(col("csim"))).as[Double].head()
    val s0 = meanSim(0) // raw seed assignment
    val s2 = meanSim(2)
    assert(s2 >= s0 - 1e-9, s"mean csim degraded: $s0 -> $s2")
    Caches.clear()
  }

  test("fit + classify equals kmeansAssign, and classify applies to a " +
    "STREAMING frame (pure projection — no state, no shuffle)") {
    val model = Clustering.fit(emb, col("vec_id"), col("embedding"),
      k = 4, iters = 2)
    assert(model.nonEmpty && model.size <= 4)
    val served = Clustering.classify(emb, col("embedding"), model)
      .select(col("vec_id"), col("cluster"), col("csim"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val direct = Clustering.kmeansAssign(emb, col("vec_id"),
      col("embedding"), k = 4, iters = 2)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(served == direct, "fit+classify must equal the one-shot path")
    // streaming application: the same projection rides a file stream
    val src = java.nio.file.Files.createTempDirectory("cls_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cls_ck").toString
    val out = java.nio.file.Files.createTempDirectory("cls_out").toString
    emb.limit(20).write.mode("append").parquet(src)
    val stream = spark.readStream.schema(emb.schema).parquet(src)
    val q = Clustering.classify(stream, col("embedding"), model)
      .select("vec_id", "cluster")
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", out).start()
    q.awaitTermination(60000)
    val streamed = spark.read.parquet(out)
      .as[(Long, Long)].collect().toMap
    val expect = direct.map(r => r._1 -> r._2).toMap
    assert(streamed.nonEmpty &&
      streamed.forall { case (id, cl) => expect(id) == cl })
    Caches.clear()
  }

  test("semDedup pairs are a subset of exhaustive cosine pairs at the " +
    "same threshold (exact precision), with full recall within clusters") {
    val t = 0.3
    val sem = Clustering.semDedupPairs(emb, col("vec_id"), col("embedding"),
      threshold = t, k = 4, iters = 1)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val exact = Similarity.cosinePairs(emb, col("vec_id"), col("embedding"))
      .filter(col("sim") >= t)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(sem.subsetOf(exact), "semDedup must never fabricate a pair")
    // recall within blocks is exact: every exhaustive pair whose two ids
    // share a cluster must be found
    val assign = Clustering.kmeansAssign(emb, col("vec_id"),
      col("embedding"), k = 4, iters = 1)
      .select("id", "cluster").as[(Long, Long)].collect().toMap
    val inBlock = exact.filter { case (a, b) => assign(a) == assign(b) }
    assert(sem == inBlock,
      s"within-cluster recall must be exact: ${inBlock.size} in-block, " +
        s"${sem.size} found")
    Caches.clear()
  }

  test("winnowing guarantees a shared fingerprint for a long shared " +
    "substring and none for disjoint vocabularies") {
    // two docs sharing a 10-token run (>= window + n - 1 = 6 tokens), one
    // doc with a disjoint vocabulary
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, s"intro words then $shared and a tail"),
      (2L, s"$shared completely different ending here"),
      (3L, "unrelated content with zero overlapping vocabulary tokens")
    ).toDF("doc_id", "text")
    val sets = Dedup.winnowFingerprintSets(docs, col("doc_id"), col("text"),
      n = 3, window = 4)
      .as[(Long, Seq[Long])].collect().toMap
    assert(sets.size == 3)
    // the winnowing guarantee: a shared substring of >= window + n - 1
    // tokens MUST contribute at least one common fingerprint
    assert(sets(1L).toSet.intersect(sets(2L).toSet).nonEmpty,
      "docs sharing a 10-token run must share a fingerprint")
    // disjoint vocabulary -> no shared grams -> no shared fingerprints
    assert(sets(1L).toSet.intersect(sets(3L).toSet).isEmpty)
    assert(sets(2L).toSet.intersect(sets(3L).toSet).isEmpty)
  }

  test("upsert: updates win on version, base rows survive untouched keys") {
    val base = Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
      .toDF("k", "v", "version")
    val upd = Seq((2L, "B", 2L), (4L, "D", 2L)).toDF("k", "v", "version")
    val m = graft.ingest.Compaction.upsert(base, upd, Seq("k"), "version")
      .select("k", "v", "version").as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq
    assert(m == Seq((1L, "a", 1L), (2L, "B", 2L), (3L, "c", 1L),
      (4L, "D", 2L)))
    // same-version tie: the update side wins
    val tie = graft.ingest.Compaction.upsert(base,
      Seq((1L, "A", 1L)).toDF("k", "v", "version"), Seq("k"), "version")
      .filter(col("k") === 1).select("v").as[String].head()
    assert(tie == "A")
  }

  test("upsertVersioned: the highest version wins across BOTH sides — a " +
    "late old-version update cannot regress the base row") {
    val base = Seq((1L, "new", 5L), (2L, "b", 1L)).toDF("k", "v", "version")
    val upd = Seq((1L, "stale", 2L), (2L, "B", 1L), (3L, "c", 1L))
      .toDF("k", "v", "version")
    val m = graft.ingest.Compaction
      .upsertVersioned(base, upd, Seq("k"), "version")
      .select("k", "v", "version").as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq
    // k=1 keeps the base (5 > 2); k=2 same version -> update wins;
    // k=3 inserts
    assert(m == Seq((1L, "new", 5L), (2L, "B", 1L), (3L, "c", 1L)), m)
    // exact-duplicate conflict (same key, same version, different
    // payload) resolves deterministically via the payload tiebreak
    val dup = Seq((9L, "x", 1L), (9L, "y", 1L)).toDF("k", "v", "version")
    val empty = base.filter(lit(false))
    val r1 = graft.ingest.Compaction
      .upsertVersioned(empty, dup, Seq("k"), "version")
      .select("v").as[String].head()
    val r2 = graft.ingest.Compaction
      .upsertVersioned(empty, dup.repartition(7), Seq("k"), "version")
      .select("v").as[String].head()
    assert(r1 == "y" && r2 == "y", s"$r1/$r2") // max payload, any layout
  }

  test("k-center greedy: unique spread centers, min-id seed, " +
    "non-increasing covering radii, and rank-2 is the true farthest " +
    "point from the seed") {
    import org.apache.spark.sql.functions.{col, min => smin}
    val r = Clustering.kCenterGreedy(emb, col("vec_id"), col("embedding"),
      k = 6).collect().sortBy(_.getLong(0))
    Caches.clear()
    assert(r.length == 6)
    val ids = r.map(_.getLong(1))
    assert(ids.distinct.length == 6)
    // seed is the min id and carries no radius
    val minId = emb.agg(smin(col("vec_id"))).head().getLong(0)
    assert(ids.head == minId && r.head.isNullAt(2))
    // radii are the max-min certificates: strictly ordered non-increasing
    val radii = r.tail.map(_.getDouble(2))
    assert(radii.sliding(2).forall(p => p.head >= p.last), radii.toSeq)
    // rank-2 must be the exact farthest point from the seed
    val far = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") === minId), emb,
      col("vec_id"), col("embedding"), col("vec_id"), col("embedding"),
      k = emb.count().toInt - 1)
      .orderBy(col("sim").asc, col("n_id"))
      .select("n_id").head().getLong(0)
    assert(ids(1) == far)
  }

  test("bisectingAssign: every vector lands in one leaf, leaf ids stay " +
    "inside [0, 2^levels), and level-1 labels are a PREFIX of level-2 " +
    "labels (true hierarchy, not a refit)") {
    val two = Clustering.bisectingAssign(emb, col("vec_id"),
      col("embedding"), levels = 2, iters = 2)
      .as[(Long, Long, Double)].collect()
    assert(two.length == emb.count())
    assert(two.map(_._1).distinct.length == two.length)
    assert(two.forall(r => r._2 >= 0 && r._2 < 4), "leaf id out of range")
    assert(two.map(_._2).distinct.length > 1, "degenerate single leaf")
    val one = Clustering.bisectingAssign(emb, col("vec_id"),
      col("embedding"), levels = 1, iters = 2)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    // the level-2 leaf id's high bit IS the level-1 assignment — the
    // split path is stable because each level only refines its parent
    assert(two.forall(r => r._2 / 2 == one(r._1)),
      "level-2 ids must refine level-1 ids")
    Caches.clear()
  }

  test("bisectingAssign separates a planted two-blob corpus at level 1") {
    // blob A around +e1, blob B around -e1, tiny deterministic jitter.
    // Blob membership is (i/4)%2 so the two hash-rank seeds (ids 8 and 4
    // — the lowest hashRank values among 0..39) land in DIFFERENT blobs:
    // with both seeds in one blob, symmetric-mixture 2-means stalls (both
    // centroids stay balanced mixtures forever) — real k-means behavior,
    // not an operator bug, but not what this test probes.
    val dim = 8
    val rows = (0L until 40L).map { i =>
      val sign = if ((i / 4) % 2 == 0) 1.0 else -1.0
      val v = (0 until dim).map(j =>
        (if (j == 0) sign else 0.01 * ((i * 7 + j) % 5 - 2)).toFloat)
      (i, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val a = Clustering.bisectingAssign(df, col("vec_id"), col("embedding"),
      levels = 1, iters = 2)
      .as[(Long, Long, Double)].collect()
    val bySign = a.groupBy(r => (r._1 / 4) % 2).map { case (k, v) =>
      k -> v.map(_._2).distinct.toSeq }
    // each blob maps to exactly one child, and the two differ
    assert(bySign(0L).length == 1 && bySign(1L).length == 1,
      s"blob split across children: $bySign")
    assert(bySign(0L).head != bySign(1L).head, s"blobs merged: $bySign")
    Caches.clear()
  }

  test("simplifiedSilhouette scores planted well-separated blobs near 1 " +
    "and a deliberate midpoint near 0") {
    // same two-blob construction (k=2 via kmeans), plus one extra point
    // equidistant from both blob centers along an orthogonal axis
    val dim = 8
    val rows = (0L until 40L).map { i =>
      val sign = if ((i / 4) % 2 == 0) 1.0 else -1.0
      val v = (0 until dim).map(j =>
        (if (j == 0) sign else 0.01 * ((i * 7 + j) % 5 - 2)).toFloat)
      (i, v)
    } :+ (99L, (0 until dim).map(j =>
      if (j == 1) 1.0f else 0.0f))
    val df = rows.toDF("vec_id", "embedding")
    val sil = Clustering.simplifiedSilhouette(df, col("vec_id"),
      col("embedding"), k = 2, iters = 2)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    val blobScores = sil.filter(_._1 != 99L).values
    assert(blobScores.forall(_ > 0.5),
      s"well-separated blob members must score high: $sil")
    // the orthogonal point is ~equidistant (cosine ~0) from both
    // centroids: silhouette must sit near zero, far below the blobs
    assert(math.abs(sil(99L)) < 0.3,
      s"midpoint must be ambiguous: ${sil(99L)}")
    Caches.clear()
  }

  test("embeddingOutliers flags a planted far-off-axis point and " +
    "nothing from the tight blobs") {
    // two tight blobs on +/- axis 0 (40 pts) plus ONE point tilted far
    // off its blob's axis — its centroid distance is way outside the
    // blob's MAD band while every ordinary member stays inside
    val dim = 8
    val rows = (0L until 40L).map { i =>
      val sign = if ((i / 4) % 2 == 0) 1.0 else -1.0
      val v = (0 until dim).map(j =>
        (if (j == 0) sign else 0.001 * ((i * 7 + j) % 5 - 2)).toFloat)
      (i, v)
    } :+ (99L, (0 until dim).map(j =>
      if (j == 0) 0.4f else if (j == 1) 0.9f else 0.0f))
    val df = rows.toDF("vec_id", "embedding")
    val out = Clustering.embeddingOutliers(df, col("vec_id"),
      col("embedding"), k = 2, iters = 2)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(99L),
      s"exactly the planted point must be flagged: ${out.toSeq}")
    val (_, _, dist, med, mad) = out.head
    assert(dist - med > 4.4478 * mad)
    Caches.clear()
  }

  test("embeddingOutliers median/MAD matches the hand-computed " +
    "histogram-rank arithmetic, including the even-count midpoint") {
    // one cluster of 5 collinear-but-noisy points plus the outlier (n=6):
    // distances quantized at 6dp, median = mean of ranks 3 and 4 (the
    // even-count midpoint) — checked via the flagged row's carried
    // med/mad against an independent Scala replay
    val dim = 4
    val base = Seq(
      (0L, Seq(1.0f, 0.000f, 0f, 0f)),
      (1L, Seq(1.0f, 0.020f, 0f, 0f)),
      (2L, Seq(1.0f, 0.040f, 0f, 0f)),
      (3L, Seq(1.0f, 0.060f, 0f, 0f)),
      (4L, Seq(1.0f, 0.080f, 0f, 0f)),
      (9L, Seq(0.5f, 0.866f, 0f, 0f))) // ~60 degrees off: the outlier
    val df = base.toDF("vec_id", "embedding")
    val out = Clustering.embeddingOutliers(df, col("vec_id"),
      col("embedding"), k = 1, iters = 1, cut = 2.0)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(out.length == 1 && out.head._1 == 9L, out.toSeq)
    val (_, _, dist, med, mad) = out.head
    // replicate the operator's own arithmetic independently in Scala:
    // 6dp distances, median = mean of the two middle ranks over ALL 5
    // points (odd n: both ranks coincide), dev, then mad the same way
    val sp = spark
    import sp.implicits._
    val ds = Clustering.kmeansAssign(df, col("vec_id"), col("embedding"),
      k = 1, iters = 1)
      .select(col("id"), round(lit(1.0) - col("csim"), 6).as("dist"))
      .as[(Long, Double)].collect().toMap
    val sorted = ds.values.toSeq.sorted
    val n = sorted.length
    def medOf(vs: Seq[Double]): Double = {
      val s = vs.sorted
      val lo = s((vs.length + 1) / 2 - 1); val hi = s((vs.length + 2) / 2 - 1)
      BigDecimal((lo + hi) / 2).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val medH = medOf(sorted)
    val devs = sorted.map(v => BigDecimal(math.abs(v - medH)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(med == medH, s"median $med vs hand $medH over $sorted")
    assert(mad == medOf(devs), s"mad $mad vs hand ${medOf(devs)}")
    assert(dist == ds(9L) && n == 6)
    Caches.clear()
  }
}
