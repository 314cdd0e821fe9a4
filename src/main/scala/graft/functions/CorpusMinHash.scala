package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Corpus-level MinHash: element-wise minimum of per-document MinHash
  * signatures. The aggregated signature of a whole corpus/shard behaves
  * exactly like a document signature, so the Jaccard similarity between two
  * corpora' shingle sets is estimated by the fraction of agreeing signature
  * positions — without ever joining their shingles.
  *
  * This is the engine's typed-UDAF surface (SURVEY §2.8): an
  * `Aggregator[IN, BUF, OUT]` with a commutative/associative merge, so Spark
  * executes it with map-side partial aggregation — one pass, one shuffle of
  * k longs per group, regardless of corpus size. At 100 TB this is how you
  * answer "how similar are shards A and B" in one scan.
  */
object CorpusMinHash {

  final class MinSignature(val numHashes: Int)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)
    override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
      var i = 0
      while (i < numHashes && i < sig.length) {
        if (sig(i) < buf(i)) buf(i) = sig(i)
        i += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      Encoders.kryo[Array[Long]]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Column form: aggregate per-doc `minhashSignature` columns into the
    * corpus signature. */
  def corpusSignature(sigCol: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.functions._
    // element-wise min expressed declaratively: min per position —
    // zip the signature with its index, explode-free via k aggregates
    array((0 until numHashes).map(i =>
      min(element_at(sigCol, i + 1))): _*)
  }

  /** Estimated Jaccard between two corpus signatures: fraction of agreeing
    * positions. */
  def estimatedJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    require(a.length == b.length && a.nonEmpty)
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
  }
}
