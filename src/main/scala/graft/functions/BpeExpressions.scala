package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Apply a frozen BPE merge list (rank order) to an `array<string>` of
  * symbols in ONE native pass — bit-identical to folding
  * `TextAnalysis.bpeMergeOnce` per merge (the greedy left-to-right
  * non-overlapping rewrite: out.last == l && x == r replaces out.last
  * with l·r), minus two scaling hazards of the composed fold:
  *
  *  - plan depth: the fold nests one interpreted `aggregate` lambda per
  *    merge, so a 64-merge batch serializes a 64-deep expression tree
  *    (StackOverflowError in task deserialization near depth ~500 when
  *    the trainer's late rounds go wide) — here the merge list is plain
  *    expression state and depth is constant;
  *  - evaluation: each fold level re-materializes the accumulator array
  *    per element through the interpreted HOF evaluator, where this loop
  *    is one compiled pass costing |merges| × |symbols| comparisons.
  */
case class BpeApplyMerges(child: Expression,
                          merges: Seq[(String, String)])
    extends UnaryExpression with RefEvalCodegen {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_apply_merges requires array<string>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[ArrayData]
    var arr = new Array[String](in.numElements())
    var i = 0
    while (i < arr.length) {
      arr(i) = in.getUTF8String(i).toString; i += 1
    }
    merges.foreach { case (l, r) =>
      val lr = l + r
      val out = new Array[String](arr.length)
      var n = 0
      var j = 0
      while (j < arr.length) {
        if (n > 0 && out(n - 1) == l && arr(j) == r) out(n - 1) = lr
        else { out(n) = arr(j); n += 1 }
        j += 1
      }
      arr = java.util.Arrays.copyOf(out, n)
    }
    new GenericArrayData(arr.map(s =>
      org.apache.spark.unsafe.types.UTF8String.fromString(s)
        .asInstanceOf[Any]))
  }

  override protected def withNewChildInternal(c: Expression): BpeApplyMerges =
    copy(child = c)
  override def prettyName: String = "bpe_apply_merges"
}

/** WordPiece-style greedy longest-match-first segmentation of ONE word
  * against a FROZEN two-part vocabulary (Wu et al. 2016's inference rule;
  * the training side of this family is the BPE trainer above — WordPiece
  * serving differs from BPE serving in matching the vocabulary directly
  * instead of replaying merges): at the word start the longest prefix in
  * `initial` wins; after that the longest prefix in `cont` wins
  * (continuation pieces are emitted with a '#' marker). A position no
  * piece covers consumes ONE character as an out-of-vocabulary piece
  * marked '?' — per-character fallback instead of WordPiece's
  * whole-word UNK so the stats stay informative and every word
  * round-trips losslessly (strip markers and concatenate = the word).
  *
  * One compiled loop per word, constant expression depth — the same
  * scaling argument as BpeApplyMerges: cost is |word| × maxPieceLen
  * substring probes against two hash sets. */
case class WordPieceSegment(child: Expression, initial: Seq[String],
                            cont: Seq[String])
    extends UnaryExpression with RefEvalCodegen {
  require(initial.nonEmpty && cont.nonEmpty)
  require((initial ++ cont).forall(p =>
    p.nonEmpty && !p.contains("#") && !p.contains("?")),
    "vocab pieces must be non-empty and marker-free")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"wordpiece_segment requires string, got $other")
    }
  }

  @transient private lazy val iSet = initial.toSet
  @transient private lazy val cSet = cont.toSet
  @transient private lazy val maxLen =
    (initial.iterator ++ cont.iterator).map(_.length).max

  override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 0
    var first = true
    while (pos < word.length) {
      var l = math.min(maxLen, word.length - pos)
      var found: String = null
      val set = if (first) iSet else cSet
      while (l >= 1 && found == null) {
        val cand = word.substring(pos, pos + l)
        if (set.contains(cand)) found = cand else l -= 1
      }
      val piece =
        if (found != null) { pos += found.length; found }
        else { val c = word.substring(pos, pos + 1); pos += 1; "?" + c }
      out += org.apache.spark.unsafe.types.UTF8String.fromString(
        if (first) piece else "#" + piece)
      first = false
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): WordPieceSegment =
    copy(child = c)
  override def prettyName: String = "wordpiece_segment"
}

/** Unigram-LM Viterbi segmentation of ONE word against a FROZEN scored
  * vocabulary (Kudo ACL 2018's inference rule — the third member of the
  * subword-serving family: BPE replays merges, WordPiece greedy-matches
  * the vocabulary, unigram picks the GLOBALLY best segmentation by
  * dynamic programming). Scores are integer micro-log-probs (negative
  * longs), so the DP is exact arithmetic and cross-engine replayable —
  * no float log anywhere. A position no piece covers consumes ONE
  * character as an out-of-vocabulary piece marked '?' at fixed
  * `oovScore` (worse than any vocab piece), so every word segments and
  * round-trips losslessly (strip markers and concatenate = the word).
  *
  * best(i) = max over piece p ending at i of best(i-|p|) + score(p);
  * ties break to the LONGER final piece (candidates probed longest
  * first, replaced only when strictly better) — for a fixed length the
  * piece text is determined by the word, so (score, length) is a total
  * order and the argmax path is unique by induction. One compiled
  * O(|word| × maxPieceLen) loop per word, constant expression depth —
  * the same scaling argument as BpeApplyMerges. */
case class UnigramSegment(child: Expression, vocab: Seq[(String, Long)],
                          oovScore: Long)
    extends UnaryExpression with RefEvalCodegen {
  require(vocab.nonEmpty, "unigram vocab must be non-empty")
  require(vocab.forall { case (p, s) =>
    p.nonEmpty && !p.contains("?") && !p.contains(" ") && s < 0 },
    "vocab pieces must be non-empty, marker-free, negatively scored")
  require(oovScore < vocab.map(_._2).min,
    "oovScore must be worse than every vocab piece")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unigram_segment requires string, got $other")
    }
  }

  @transient private lazy val scores: Map[String, Long] = vocab.toMap
  @transient private lazy val maxLen = vocab.iterator.map(_._1.length).max

  override def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString
    val n = word.length
    // best(i): optimal score over the first i chars; back(i): length of
    // the final piece (negative = OOV single char)
    val best = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var chosen = Long.MinValue
      var chosenLen = 0
      var l = math.min(maxLen, i)
      while (l >= 1) {
        val piece = word.substring(i - l, i)
        scores.get(piece) match {
          case Some(s) =>
            val cand = best(i - l) + s
            if (cand > chosen) { chosen = cand; chosenLen = l }
          case None if l == 1 =>
            val cand = best(i - 1) + oovScore
            if (cand > chosen) { chosen = cand; chosenLen = -1 }
          case None =>
        }
        l -= 1
      }
      best(i) = chosen; back(i) = chosenLen
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = n
    while (pos > 0) {
      val bl = back(pos)
      val piece =
        if (bl < 0) "?" + word.substring(pos - 1, pos)
        else word.substring(pos - bl, pos)
      out += org.apache.spark.unsafe.types.UTF8String.fromString(piece)
      pos -= math.abs(bl)
    }
    new GenericArrayData(out.reverseIterator.toArray)
  }

  override protected def withNewChildInternal(c: Expression): UnigramSegment =
    copy(child = c)
  override def prettyName: String = "unigram_segment"
}

object BpeExpressions {
  import org.apache.spark.sql.graft.bridge

  def bpeApplyMerges(symbols: Column,
                     merges: Seq[(String, String)]): Column =
    bridge.column(BpeApplyMerges(bridge.expression(symbols), merges))

  def wordpieceSegment(word: Column, initial: Seq[String],
                       cont: Seq[String]): Column =
    bridge.column(WordPieceSegment(bridge.expression(word), initial, cont))

  def unigramSegment(word: Column, vocab: Seq[(String, Long)],
                     oovScore: Long): Column =
    bridge.column(UnigramSegment(bridge.expression(word), vocab, oovScore))
}
