package graft.analytics

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The persisted IVF index (offline-build / online-serve split):
  * round-trip losslessness, rebuild determinism, and the probed-fraction
  * read the in-memory path cannot have (PartitionFilters — audited in
  * PlanAuditSpec via the registered query). */
class IvfIndexSpec extends SparkSuite {

  private def dir(tag: String) =
    java.nio.file.Files.createTempDirectory(s"ivf_idx_$tag").toString

  test("serving a persisted index equals the in-memory Lloyd path " +
    "row-for-row, and a second build is byte-stable (same model, same " +
    "results)") {
    val emb = graft.Tables.load(spark, sf0001, "embeddings")
    val (id, v) = (col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val direct = Similarity.ivfTopK(queries, emb, id, v, id, v, k = 10,
        refineIters = 2, replicas = 2)
      .collect().map(_.toSeq).toSet
    Caches.clear()

    val d1 = dir("a")
    Similarity.buildIvfIndex(emb, id, v, d1)
    Caches.clear()
    val served = Similarity.ivfTopKServe(spark, d1, queries, id, v, k = 10)
      .collect().map(_.toSeq).toSet
    assert(served == direct,
      s"served diverged: missing ${direct.diff(served).take(3)}, " +
        s"extra ${served.diff(direct).take(3)}")

    // rebuild determinism: a second independent build yields the same
    // model rows and the same answers
    val d2 = dir("b")
    Similarity.buildIvfIndex(emb, id, v, d2)
    Caches.clear()
    val m1 = Similarity.loadIvfModel(spark, d1)
    val m2 = Similarity.loadIvfModel(spark, d2)
    assert(m1 == m2, "centroid model not rebuild-stable")
    val served2 = Similarity.ivfTopKServe(spark, d2, queries, id, v, k = 10)
      .collect().map(_.toSeq).toSet
    assert(served2 == served)
    Caches.clear()
  }

  test("incremental append: new vectors assigned under the FROZEN model " +
    "land in their lists and serving equals the frozen-model scan over " +
    "the union corpus — existing objects untouched") {
    import Similarity.{asDouble, dot, norm}
    val emb = graft.Tables.load(spark, sf0001, "embeddings")
    val (id, v) = (col("vec_id"), col("embedding"))
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 === 1)
    val queries = emb.filter(col("vec_id") % 100 === 0)

    val d = dir("incr")
    Similarity.buildIvfIndex(half, id, v, d)
    Caches.clear()
    val before = new java.io.File(s"$d/corpus").listFiles()
      .filter(_.getName.startsWith("list_id=")).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.lastModified()).toMap
    Similarity.appendToIvfIndex(spark, d, rest, id, v)
    Caches.clear()
    // append-only: every pre-existing object is still there, unmodified
    before.foreach { case (path, ts) =>
      val f = new java.io.File(path)
      assert(f.exists() && f.lastModified() == ts, s"$path was rewritten")
    }

    val served = Similarity.ivfTopKServe(spark, d, queries, id, v, k = 10)
      .collect().map(_.toSeq).toSet

    // reference: frozen-model (fit on HALF) assignments over the UNION
    // corpus, scanned in memory with the identical ranking semantics
    val model = Similarity.loadIvfModel(spark, d)
    val c = emb.select(id.as("n_id"), asDouble(v).as("c_v"))
      .withColumn("c_n", norm(col("c_v")))
    val assigned = Clustering.probe(c, col("c_v"), model, 2)
    val q = queries.select(id.as("q_id"), asDouble(v).as("q_v"))
      .withColumn("q_n", norm(col("q_v")))
    val probes = Clustering.probe(q, col("q_v"), model, 4)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    val expect = assigned.join(broadcast(probes), Seq("list_id"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        round(dot(col("q_v"), col("c_v")) / (col("q_n") * col("c_n")), 4)
          .as("sim"))
      .dropDuplicates("q_id", "n_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("q_id"), col("n_id"), col("sim"),
        col("rank"))
      .collect().map(_.toSeq).toSet
    assert(served == expect,
      s"append drifted from the frozen-model contract: missing " +
        s"${expect.diff(served).take(3)}, extra ${served.diff(expect).take(3)}")
    // and the appended half is actually findable: some neighbor ids are odd
    assert(served.exists(r => r(1).asInstanceOf[Long] % 2 == 1),
      "no appended (odd-id) vector ever surfaces in the top-k")
    Caches.clear()
  }

  test("served IVF-PQ equals the in-memory composed construction and " +
    "the persisted index holds codes, not floats") {
    val emb = graft.Tables.load(spark, sf0001, "embeddings")
    val (id, v) = (col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val direct = Similarity.ivfPqTopK(queries, emb, id, v, id, v, k = 10,
        refineIters = 2, replicas = 2)
      .collect().map(_.toSeq).toSet
    Caches.clear()

    val d = dir("pq")
    Similarity.buildIvfPqIndex(emb, id, v, d)
    Caches.clear()
    val served = Similarity.ivfPqTopKServe(spark, d, queries, id, v,
        k = 10)
      .collect().map(_.toSeq).toSet
    assert(served == direct,
      s"served IVF-PQ diverged: missing ${direct.diff(served).take(3)}, " +
        s"extra ${served.diff(direct).take(3)}")

    // the layout contract: the codes table carries NO raw-vector
    // column — m int codes per row is the whole per-vector payload
    val codesSchema = spark.read.parquet(s"$d/codes").schema
    assert(codesSchema.fieldNames.toSet == Set("n_id", "codes", "list_id"),
      s"unexpected serving columns: ${codesSchema.fieldNames.mkString(",")}")

    // the re-rank pool path reads raw vectors from the BASE table and
    // must match the in-memory reranked composition
    val rrDirect = Similarity.ivfPqRerankTopK(queries, emb, id, v, id, v,
        k = 10, refineIters = 2, replicas = 2, pool = 40)
      .collect().map(_.toSeq).toSet
    Caches.clear()
    val rrServed = Similarity.ivfPqRerankServe(spark, d, queries, emb,
        id, v, id, v, k = 10, pool = 40)
      .collect().map(_.toSeq).toSet
    assert(rrServed == rrDirect,
      "served rerank diverged from the in-memory composition")
    Caches.clear()
  }

  test("appendToIvfIndex: a delta appended against the frozen centroids " +
    "is searchable exactly like a one-pass assignment of the UNION under " +
    "the same model — corpus and serve results are identical, and the " +
    "upserted rows land in their probed lists") {
    val e = graft.Tables.load(spark, sf0001, "embeddings")
    val (id, v) = (col("vec_id"), col("embedding"))
    val base = e.filter(col("vec_id") % 2 === 0)
    val delta = e.filter(col("vec_id") % 2 === 1)
    val queries = e.filter(col("vec_id") % 100 === 0)

    // lifecycle path: build on the base half, append the delta
    val dUp = dir("up")
    Similarity.buildIvfIndex(base, id, v, dUp)
    Similarity.appendToIvfIndex(spark, dUp, delta, id, v)
    Caches.clear()
    val upserted = Similarity.ivfTopKServe(spark, dUp, queries, id, v,
      k = 10).collect().map(_.toSeq).toSet

    // reference path: a genuinely INDEPENDENT construction — persist
    // the frozen model (a base-half fit is deterministic, so dRef's
    // model equals dUp's), wipe the base corpus, then assign the FULL
    // union in one pass under that frozen model. If the lifecycle
    // append dropped, doubled, or mis-listed any row — or if the
    // build's own base assignment diverged from frozen-model
    // assignment — the corpus sets differ and this fails.
    val dRef = dir("upref")
    Similarity.buildIvfIndex(base, id, v, dRef)
    val corpusDir = new java.io.File(s"$dRef/corpus")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
    }
    rm(corpusDir)
    Similarity.appendToIvfIndex(spark, dRef, base.union(delta), id, v)
    Caches.clear()
    val ref = Similarity.ivfTopKServe(spark, dRef, queries, id, v, k = 10)
      .collect().map(_.toSeq).toSet
    assert(upserted == ref,
      "append-of-delta diverged from one-pass union assignment")

    // strongest form: the persisted (n_id, list_id) assignment sets are
    // row-identical, not just the served top-k
    def assignments(d: String) = spark.read.parquet(s"$d/corpus")
      .select(col("n_id"), col("list_id"))
      .collect().map(_.toSeq).toSet
    assert(assignments(dUp) == assignments(dRef),
      "persisted corpus assignments differ between append and union")

    // the delta is actually FINDABLE: odd (upserted) neighbors appear
    val oddNeighbors = upserted.count(r => r(1).asInstanceOf[Long] % 2 == 1)
    assert(oddNeighbors > 0, "no upserted vector ever served — the " +
      "delta is invisible to queries")
    // and the upserted corpus holds every vector exactly once per
    // assigned replica list (no doubling)
    val n = spark.read.parquet(s"$dUp/corpus")
      .groupBy(col("n_id"), col("list_id")).count()
      .filter(col("count") > 1).count()
    assert(n == 0, s"$n (n_id, list_id) duplicates after upsert")
  }

  test("STREAMING index maintenance: a checkpointed structured stream " +
    "appends micro-batches through foreachBatch and serving sees the " +
    "union; a replayed batch lands on the same deterministic object " +
    "names — byte-level no-op, zero duplicates (X1 for the index)") {
    import org.apache.spark.sql.streaming.Trigger
    val e = graft.Tables.load(spark, sf0001, "embeddings")
    val (id, v) = (col("vec_id"), col("embedding"))
    val base = e.filter(col("vec_id") % 2 === 0)
    val delta = e.filter(col("vec_id") % 2 === 1)
    val d = dir("stream")
    Similarity.buildIvfIndex(base, id, v, d)

    // two source files -> two micro-batches under maxFilesPerTrigger=1
    val src = java.nio.file.Files.createTempDirectory("ivf_stream_src")
      .toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivf_stream_ckpt")
      .toString
    delta.filter(col("vec_id") % 4 === 1).coalesce(1)
      .write.mode("append").parquet(src)
    // the file source orders batches by mtime — keep the two source
    // files unambiguously ordered so batch 0 is the %4==1 payload
    Thread.sleep(1100)
    delta.filter(col("vec_id") % 4 === 3).coalesce(1)
      .write.mode("append").parquet(src)
    val q = spark.readStream.schema(e.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, bid: Long) =>
        Similarity.appendToIvfIndexExactlyOnce(spark, d, b,
          col("vec_id"), col("embedding"), bid)
        ()
      }
      .start()
    q.awaitTermination(120000)

    // the streamed index serves exactly like a one-pass frozen-model
    // assignment of the union (same reference construction as the batch
    // append test)
    val queries = e.filter(col("vec_id") % 100 === 0)
    Caches.clear()
    val served = Similarity.ivfTopKServe(spark, d, queries, id, v, k = 10)
      .collect().map(_.toSeq).toSet
    val dRef = dir("streamref")
    Similarity.buildIvfIndex(base, id, v, dRef)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
    }
    rm(new java.io.File(s"$dRef/corpus"))
    Similarity.appendToIvfIndex(spark, dRef, base.union(delta), id, v)
    Caches.clear()
    val ref = Similarity.ivfTopKServe(spark, dRef, queries, id, v, k = 10)
      .collect().map(_.toSeq).toSet
    assert(served == ref, "streamed appends diverged from union assignment")

    // at-least-once replay: re-deliver one batch with the same batchId —
    // identical object names, identical row count, identical serving
    def listing(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$d/corpus")).map(_.getName)
        .filterNot(n => n.startsWith("_") || n.startsWith(".")).toSet
    }
    val (names0, rows0) =
      (listing(), spark.read.parquet(s"$d/corpus").count())
    val replayed = delta.filter(col("vec_id") % 4 === 1)
    // batch 0 carried one of the two files; replay BOTH candidate
    // payloads under their original ids — whichever file batch 0/1
    // actually held, the overwrite lands on the same names
    Similarity.appendToIvfIndexExactlyOnce(spark, d, replayed,
      id, v, batchId = 0L)
    Similarity.appendToIvfIndexExactlyOnce(spark, d,
      delta.filter(col("vec_id") % 4 === 3), id, v, batchId = 1L)
    assert(listing() == names0, "replay minted new object names")
    assert(spark.read.parquet(s"$d/corpus").count() == rows0,
      "replay duplicated rows")
    Caches.clear()
    val servedAfter = Similarity.ivfTopKServe(spark, d, queries, id, v,
      k = 10).collect().map(_.toSeq).toSet
    assert(servedAfter == served, "replay changed serving results")
  }

  test("compactIvfIndex: appends fragment the list directories, compaction " +
    "collapses them to one file per list, serves bit-identically, and " +
    "heals a crash window from the parked copy") {
    val e = graft.Tables.load(spark, sf0001, "embeddings")
    val (id, v) = (col("vec_id"), col("embedding"))
    val d = dir("cpt")
    Similarity.buildIvfIndex(e.filter(col("vec_id") % 3 === 0), id, v, d)
    Similarity.appendToIvfIndex(spark, d, e.filter(col("vec_id") % 3 === 1),
      id, v)
    Similarity.appendToIvfIndex(spark, d, e.filter(col("vec_id") % 3 === 2),
      id, v)
    val queries = e.filter(col("vec_id") % 100 === 0)
    Caches.clear()
    val before = Similarity.ivfTopKServe(spark, d, queries, id, v, k = 10)
      .collect().map(_.toSeq).toSet
    def files(): Seq[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$d/corpus")).map(_.getName)
        .filterNot(n => n.startsWith("_") || n.startsWith("."))
    }
    val fragmented = files().size
    val (b, a) = Similarity.compactIvfIndex(spark, d)
    assert(b == fragmented && a == files().size, "file accounting drifted")
    // three write generations per touched list collapse to one file/list
    assert(a < b, s"no compaction: $b -> $a")
    val lists = new java.io.File(s"$d/corpus").listFiles()
      .filter(_.getName.startsWith("list_id=")).toSeq
    lists.foreach { l =>
      val n = l.listFiles().count(f => !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      assert(n == 1, s"${l.getName} holds $n files after compaction")
    }
    Caches.clear()
    val after = Similarity.ivfTopKServe(spark, d, queries, id, v, k = 10)
      .collect().map(_.toSeq).toSet
    assert(after == before, "compaction moved serving results")
    // crash window: corpus gone, parked copy present -> next call heals
    // and recompacts from the parked rows
    val corpus = new java.io.File(s"$d/corpus")
    val parked = new java.io.File(s"$d/corpus_compact_old")
    assert(corpus.renameTo(parked))
    val (b2, a2) = Similarity.compactIvfIndex(spark, d)
    assert(b2 == a && a2 == a, s"crash-heal lost files: $b2 -> $a2")
    Caches.clear()
    val healed = Similarity.ivfTopKServe(spark, d, queries, id, v, k = 10)
      .collect().map(_.toSeq).toSet
    assert(healed == before, "crash-heal changed serving results")
  }

  test("persisted-index cache key is a CONTENT fingerprint: regenerating " +
    "the data at the SAME path changes the key (forcing a rebuild — the " +
    "stale index can never be served), while an untouched table keys " +
    "stably") {
    import java.nio.file.{Files, Paths}
    val data = Files.createTempDirectory("fp_data").toString
    val table = s"$data/embeddings.parquet"
    spark.range(100).selectExpr("id AS vec_id")
      .coalesce(1).write.mode("overwrite").parquet(table)
    val k1 = graft.queries.ContentQueries.ivfIndexDir("graft_fp_test", data)
    // stable: same bytes on disk → same key (the build-once/serve-many
    // skip stays valid across queries and bench reps)
    assert(k1 == graft.queries.ContentQueries
      .ivfIndexDir("graft_fp_test", data))
    // plant a "built index" under the current key, then regenerate the
    // fixture at the same path with different content
    Files.createDirectories(Paths.get(s"$k1/model"))
    Files.createFile(Paths.get(s"$k1/model/_SUCCESS"))
    spark.range(250).selectExpr("id AS vec_id")
      .coalesce(1).write.mode("overwrite").parquet(table)
    val k2 = graft.queries.ContentQueries.ivfIndexDir("graft_fp_test", data)
    assert(k2 != k1,
      s"regenerated data at the same path must re-key the index: $k1")
    // the skip check at the NEW key finds nothing — a rebuild happens
    assert(!new java.io.File(s"$k2/model/_SUCCESS").exists(),
      "stale index visible under the regenerated key")
  }

  test("tombstone deletes: deleted ids vanish from serving, re-deleting " +
    "is idempotent, compaction folds tombstones physically and retires " +
    "the tombstone table, and serving stays identical across the fold") {
    val emb = graft.Tables.load(spark, sf0001, "embeddings")
    val (id, v) = (col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val d = dir("del")
    Similarity.buildIvfIndex(emb, id, v, d)
    Caches.clear()
    val before = Similarity.ivfTopKServe(spark, d, queries, id, v, k = 10)
      .collect().map(_.toSeq).toSet
    val deadIds = emb.filter(col("vec_id") % 7 === 3)
    Similarity.deleteFromIvfIndex(d, deadIds, id)
    Caches.clear()
    val after = Similarity.ivfTopKServe(spark, d, queries, id, v, k = 10)
      .collect()
    // no deleted id may appear as a neighbor; results must have changed
    assert(after.forall(r => r.getLong(1) % 7 != 3),
      s"tombstoned id served: ${after.find(_.getLong(1) % 7 == 3)}")
    assert(after.map(_.toSeq).toSet != before,
      "deleting ~14% of the corpus must move at least one answer")
    // idempotent re-delete
    Similarity.deleteFromIvfIndex(d, deadIds, id)
    Caches.clear()
    val again = Similarity.ivfTopKServe(spark, d, queries, id, v, k = 10)
      .collect().map(_.toSeq).toSet
    assert(again == after.map(_.toSeq).toSet, "re-delete moved results")
    // compaction folds the tombstones into the rewrite
    val nDead = deadIds.count()
    val total = emb.count()
    Similarity.compactIvfIndex(spark, d)
    assert(!new java.io.File(s"$d/tombstones").exists(),
      "compaction must retire the tombstone table")
    val remaining = spark.read.parquet(s"$d/corpus")
      .select(col("n_id")).distinct().count()
    assert(remaining == total - nDead,
      s"compacted corpus has $remaining distinct ids, want " +
        s"${total - nDead}")
    Caches.clear()
    val afterCompact = Similarity
      .ivfTopKServe(spark, d, queries, id, v, k = 10)
      .collect().map(_.toSeq).toSet
    assert(afterCompact == again,
      "serving changed across the physical fold")
  }
}
