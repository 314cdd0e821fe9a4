package graft.streaming

import graft.analytics.{Clustering, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composable per-micro-batch filters for the streaming ingest pipeline.
  *
  * A gate is a plain `DataFrame => DataFrame` mapping a batch to the rows
  * that SURVIVE it, so any batch operator lifts into the stream without a
  * dedicated sink; `StreamingIngest.startPipeline(gates = ...)` folds the
  * stack over every micro-batch before the write. All standard gates are
  * stateless projections/joins against FROZEN models (fitted offline on a
  * reference corpus), which is what makes the streamed composition equal
  * the batch pipeline run over the same rows — a gate that re-fit per
  * batch would score early batches against a different model than late
  * ones.
  *
  * Schema contract: every gate returns the batch's own columns (filter
  * semantics), so gates compose in any order and the ingest write below
  * them sees the original payload.
  */
object Gates {

  type Gate = DataFrame => DataFrame

  /** Fold a stack into one gate (applied left to right). */
  def all(gates: Gate*): Gate =
    batch => gates.foldLeft(batch)((acc, g) => g(acc))

  /** Gopher-style heuristic quality gate (`TextAnalysis.qualityKeep`):
    * token-count bounds + punctuation-ratio cap. Pure row filter. */
  def quality(textCol: String, minTokens: Int = 5, maxTokens: Int = 100000,
              maxPunctRatio: Double = 0.3): Gate =
    batch => batch.filter(TextAnalysis.qualityKeep(col(textCol), minTokens,
      maxTokens, maxPunctRatio))

  /** Full Gopher rule-bundle gate (`TextAnalysis.gopherRules`): all five
    * integer-exact rules must pass. Pure row filter — the same flags the
    * batch `text_gopher_rules` query reports, so the streamed keep set
    * equals the batch keep set by construction. */
  def gopher(textCol: String, minTokens: Int = 20, maxTokens: Int = 80,
             minMwl: Int = 4, maxMwl: Int = 5, maxPunctPct: Int = 5,
             minAlphaPct: Int = 80, minStops: Int = 2): Gate =
    batch => batch.filter(
      TextAnalysis.gopherRules(col(textCol), minTokens, maxTokens, minMwl,
        maxMwl, maxPunctPct, minAlphaPct, minStops)
        .map(_._2).reduce(_ && _))

  /** Character-entropy band gate: drop template spam (low bits) and
    * binary/encrypted junk (implausibly high bits) in one projection. */
  def entropyBand(textCol: String, minBits: Double = 2.5,
                  maxBits: Double = 6.0): Gate =
    batch => batch.filter(
      TextAnalysis.charEntropy(col(textCol)).between(minBits, maxBits))

  /** Hashed-BoW classifier gate: keep documents whose logit reaches
    * `minLogit` (this corpus's logits skew negative — gate near the
    * corpus median, not 0). Native expression, pure row filter. */
  def classifier(textCol: String, minLogit: Double,
                 buckets: Int = 64): Gate =
    batch => batch.filter(
      TextAnalysis.classifierLogit(col(textCol), buckets) >= minLogit)

  /** Fitted linear-model gate — the DEPLOY half of the
    * `quality_lr_refresh` lifecycle (fit offline with
    * `Regression.olsFit`, refresh per day/epoch, hand β here): keep rows
    * whose predicted score reaches `minScore`. The coefficients ride as
    * literals inside the expression — map-only row filter, zero state,
    * zero shuffle, same frozen-model discipline as the classifier and
    * cluster gates (streamed composition keeps exactly the rows the
    * batch pipeline would keep). `features` build from the batch's own
    * columns (e.g. token/char counts). */
  def linearModel(beta: Array[Double], features: Seq[Column],
                  minScore: Double): Gate =
    batch => batch.filter(
      graft.analytics.Regression.score(beta, features) >= minScore)

  /** k-means cluster gate: classify each row against a FITTED model
    * (`Clustering.fit` offline; the centroid literal rides inside the
    * expression — zero shuffle, zero state) and keep rows landing in the
    * `keep` clusters. The transient cluster/csim columns are dropped so
    * the batch schema passes through unchanged. */
  def cluster(vecCol: String, model: Seq[Clustering.Centroid],
              keep: Set[Long]): Gate = {
    require(keep.nonEmpty, "cluster gate with an empty keep set drops " +
      "everything — almost certainly a bug")
    batch => Clustering.classify(batch, col(vecCol), model)
      .filter(col("cluster").isin(keep.toSeq: _*))
      .drop("cluster", "csim")
  }

  /** Perplexity gate against a FROZEN unigram LM
    * (`TextAnalysis.fitUnigramModel` on the reference corpus): keep
    * documents at or under `maxBitsPerToken`. The survivors semi-join
    * back so the batch keeps its own columns. Documents with ZERO tokens
    * (empty/whitespace-only text) have no perplexity and are DROPPED
    * regardless of the threshold — stack `quality(minTokens = 1)` ahead
    * of this gate if you want that drop to be explicit/configurable. */
  def perplexity(idCol: String, textCol: String,
                 model: TextAnalysis.UnigramModel,
                 maxBitsPerToken: Double): Gate = batch => {
    val keep = TextAnalysis.unigramBitsAgainst(batch, col(idCol),
      col(textCol), model)
      .filter(col("bits_per_token") <= maxBitsPerToken)
      .select(col("doc_id").as(idCol))
    batch.join(keep, Seq(idCol), "left_semi")
  }

  /** Near-dup gate against a static clean corpus (the gate-stack form of
    * `StreamingIngest.startNearDupGate`): drop batch rows whose shingle
    * Jaccard against `history` reaches `threshold` — banded MinHash
    * candidates, exact verify, anti-join back. Compose it with the other
    * gates in one `startPipeline` stack instead of a dedicated sink. */
  def nearDup(history: DataFrame, idCol: String, textCol: String,
              threshold: Double = 0.7): Gate = {
    // wiring-time history prep (round 17): nearDupAgainst re-shingled
    // and re-banded the WHOLE history corpus inside every micro-batch —
    // the foreachBatch twin of the per-round plan-rebuild disease the
    // graph loops had. Shingle + band once here, persisted; each
    // trigger pays only its own batch's prep.
    val prep = graft.analytics.Dedup.nearDupHistoryPrep(history,
      col(idCol), col(textCol))
    batch => {
      val dups = graft.analytics.Dedup.nearDupAgainstPrepped(prep, batch,
        col(idCol), col(textCol), threshold = threshold)
        .select(col("new_id").as(idCol)).distinct()
      batch.join(dups, Seq(idCol), "left_anti")
    }
  }

  /** Exact-dedup gate against FROZEN history artifacts, prepped once
    * OUTSIDE the stream (the same discipline as `embeddingDedup`'s
    * `srpPrep` and `substringClean`'s hash set — per-batch re-folding
    * would re-scan the whole history corpus every trigger):
    * {{{
    * val sketch = Dedup.bloomSketchFrame(lake, col("fp"), n).persist()
    * val keys   = lake.select(col("fp").as("_key")).distinct().persist()
    * ... gates = Seq(Gates.exactDedup(sketch, keys, "doc_id", "fp"))
    * }}}
    * Per micro-batch only sketch positives pay the key-frame join — the
    * cheapest dedup gate, stack it first. WITHIN-batch duplicate keys
    * also collapse to the smallest id (`Dedup.exact`'s contract).
    * FROZEN means frozen: history that grows while the stream runs is
    * deliberately not seen (identically to the sibling gates) —
    * re-freeze the artifacts and rebuild the stack to pick it up. The
    * caller owns the persists and their unpersist lifetime. */
  def exactDedup(sketchFrame: DataFrame, historyKeys: DataFrame,
                 idCol: String, keyCol: String): Gate = batch => {
    val fresh = graft.analytics.Dedup.newAgainstSketch(batch,
      col(idCol), col(keyCol), sketchFrame, historyKeys)
      .select(col("new_id").as(idCol))
    batch.join(fresh, Seq(idCol), "left_semi")
  }

  /** Incremental exact-substring cleaner — the one TRANSFORM in the
    * stack: it rewrites `textCol` (dropping every >= `k`-token span the
    * frozen history corpus already contains,
    * `Dedup.substringCleanAgainst`) instead of filtering rows, and
    * passes the batch schema through column-for-column. Matching is
    * case-insensitive; kept tokens keep their original bytes, so a
    * document with no history overlap passes through BYTE-IDENTICAL.
    * Stack it BEFORE
    * `quality(minTokens = ...)` so documents cleaned down to nothing are
    * then dropped explicitly. `histHashes` =
    * `Dedup.substringHistoryHashes(lake, col("text"), k)` built once,
    * outside the stream. */
  def substringClean(histHashes: DataFrame, idCol: String, textCol: String,
                     k: Int = 15): Gate = batch => {
    // reserved join-column name: a payload already carrying "clean_text"
    // must not make the select ambiguous
    val cleaned = graft.analytics.Dedup.substringCleanAgainst(batch,
      col(idCol), col(textCol), histHashes, k)
      .select(col("doc_id").as(idCol), col("clean_text").as("__ssc_clean"))
    batch.join(cleaned, Seq(idCol), "left")
      .select(batch.columns.toIndexedSeq.map {
        case c if c == textCol =>
          coalesce(col("__ssc_clean"), col(textCol)).as(textCol)
        case c => col(c)
      }: _*)
  }

  /** Embedding near-dup gate against a PREPPED history
    * (`Similarity.srpPrep(history, ...)` once, outside the stream —
    * rebuilding per batch would re-scan the whole history corpus): drop
    * batch vectors whose cosine against history reaches `threshold`.
    * SRP band candidates + exact-cosine verify, never a history
    * self-join. */
  def embeddingDedup(historyPrep: DataFrame, idCol: String, vecCol: String,
                     threshold: Double = 0.95): Gate = batch => {
    val dups = graft.analytics.Similarity.srpLshPairsAgainstPrepped(
      historyPrep, batch, col(idCol), col(vecCol), threshold = threshold)
      .select(col("new_id").as(idCol)).distinct()
    batch.join(dups, Seq(idCol), "left_anti")
  }

  /** Perceptual image-dedup gate against a FROZEN history signature set
    * (`Multimodal.dHash56(historyMedia).select("dhash").distinct()`
    * built once, outside the stream — re-decoding the history lake per
    * batch would re-read every stored image every trigger): drop batch
    * images whose dHash lands within Hamming `maxDist` of any history
    * signature. The batch decodes once (map-only, per partition), then
    * the banded join runs at distinct-signature grain — 4 x 14-bit
    * bands, `bit_count(xor)` verify — which is EXACT for maxDist <= 3
    * by pigeonhole (3 differing bits cannot dirty all 4 bands), never
    * an image-level cross join. Batch rows must carry the MediaRecord
    * shape (`idCol`, mediaType, payload); non-image rows and
    * undecodable payloads PASS THROUGH (they get no signature — route
    * them to quality/DLQ gates downstream). The image twin of
    * [[nearDup]]: crawled-image streams dedup against the stored corpus
    * before paying storage or pixel-level compare. */
  def imageDedup(historyHashes: DataFrame, idCol: String = "id",
                 maxDist: Int = 3): Gate = {
    // wiring-time, not first-batch-time: a misconfigured gate must fail
    // when the stack is built, not inside an already-running query's
    // foreachBatch (which would checkpoint-replay the same failure)
    require(maxDist >= 0 && maxDist <= 3,
      "4-band pigeonhole is exact only for maxDist <= 3")
    // wiring-time history prep (round 17): the banded expansion of the
    // frozen signature set ran INSIDE the per-batch closure — the
    // distinct + explode (and, for an unpersisted input, the upstream
    // history decode feeding it) re-executed every trigger. Built and
    // persisted once when the stack is wired.
    val histB = graft.analytics.Caches.persist(
      historyHashes.select(col("dhash").cast("long").as("h_dhash"))
        .distinct()
        .withColumn("bnd", explode(sequence(lit(0), lit(3))))
        .withColumn("band",
          expr("(h_dhash >> CAST(bnd * 14 AS INT)) & 16383")))
    batch => {
    val ss = batch.sparkSession
    import ss.implicits._
    // only image rows participate, and decode is LENIENT: a corrupt or
    // truncated payload (routine in crawl streams) yields no signature
    // and the row PASSES THROUGH to downstream quality/DLQ gates —
    // a thrown decode would fail the micro-batch and wedge the
    // checkpoint in a replay loop
    val media = batch
      .filter(col("mediaType").startsWith("image/"))
      .select(col(idCol).cast("long").as("id"),
        col("mediaType"), col("payload"))
      .as[graft.analytics.Multimodal.MediaRecord]
    val sig = graft.analytics.Multimodal.dHash56Lenient(media).toDF()
      .select(col("id"), col("dhash"))
    val newB = sig
      .withColumn("bnd", explode(sequence(lit(0), lit(3))))
      .withColumn("band", expr("(dhash >> CAST(bnd * 14 AS INT)) & 16383"))
    val dupIds = newB.join(histB, Seq("bnd", "band"))
      .filter(expr(s"bit_count(dhash ^ h_dhash) <= $maxDist"))
      .select(col("id").as(idCol)).distinct()
    batch.join(dupIds, Seq(idCol), "left_anti")
    }
  }

  /** CDC-freshness gate against a FROZEN chunk store
    * (`Dedup.cdcHistoryFps(lake, ...)` built once, outside the stream):
    * keep documents whose fraction of NEW tokens — tokens in chunks the
    * store does not already hold — reaches `minNewFrac`. Content-defined
    * cut points make this robust to edits: a near-copy of stored text
    * still chunk-aligns past its edit windows, so it scores low and
    * drops, while a genuinely new doc scores ~1.0. Subsumes exact-dup
    * filtering (an exact copy scores 0.0) with span-level sensitivity
    * between `substringClean`'s rewriting and `nearDup`'s whole-doc
    * Jaccard. */
  def cdcFreshness(historyFps: DataFrame, idCol: String, textCol: String,
                   minNewFrac: Double = 0.5, w: Int = 4,
                   maskBits: Int = 4): Gate = batch => {
    val keep = graft.analytics.Dedup.cdcNewChunks(historyFps, batch,
      col(idCol), col(textCol), w, maskBits)
      .filter(col("new_tokens").cast("double")
        >= lit(minNewFrac) * col("n_tokens").cast("double"))
      .select(col("doc_id").as(idCol))
    batch.join(keep, Seq(idCol), "left_semi")
  }
}
