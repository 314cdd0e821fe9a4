package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k aggregate: the (score desc, id asc) first k
  * rows of each group, WITHOUT a windowed sort.
  *
  * Why this exists: the idiomatic Spark top-k-per-key
  * (`row_number().over(Window.partitionBy(key).orderBy(...)) <= k`)
  * shuffles and sorts EVERY candidate row — for an all-pairs scorer
  * that is |queries|×|corpus| rows through the exchange when only
  * |queries|×k survive. This aggregate is partial-aggregation-capable
  * (TypedImperativeAggregate ⇒ map-side combine): each map task keeps at
  * most k rows per group in a bounded buffer, so the shuffle carries
  * O(groups × k × tasks) rows instead of the full candidate set, and
  * nothing is ever globally sorted. The same trick Spark itself uses for
  * global top-k (`TakeOrderedAndProject`), made available per key.
  *
  * Ordering contract matches `row_number` over (score DESC, id ASC)
  * bit-for-bit, including Spark's NaN-greatest double semantics — the
  * drop-in guarantee that lets the ANN operators swap their windows for
  * this aggregate without touching any oracle.
  *
  * The buffer holds up to 4k entries between compactions (amortized
  * O(log k) per insert via sort-and-truncate every 3k overflow inserts,
  * with an O(1) threshold reject once full); serialization is a flat
  * (double, long) byte image of the compacted top-k, so partial buffers
  * ship k entries regardless of input size. */
final case class TopKByScore(
    score: Expression, id: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScore.Buf] {

  require(k >= 1, s"topk k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    new StructType().add("score", DoubleType).add("id", LongType),
    containsNull = false)

  override def createAggregationBuffer(): TopKByScore.Buf =
    new TopKByScore.Buf(k)

  override def update(b: TopKByScore.Buf, input: InternalRow)
      : TopKByScore.Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    // null score/id rows are skipped (the window form would sort nulls
    // last and they'd only surface with fewer than k candidates; the
    // ANN callers never produce them — both inputs are non-null exprs)
    if (s != null && i != null)
      b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKByScore.Buf, o: TopKByScore.Buf)
      : TopKByScore.Buf = { b.absorb(o); b }

  override def eval(b: TopKByScore.Buf): Any = {
    val (ss, ids, n) = b.topK()
    val rows = new Array[Any](n)
    var i = 0
    while (i < n) { rows(i) = InternalRow(ss(i), ids(i)); i += 1 }
    new GenericArrayData(rows)
  }

  override def serialize(b: TopKByScore.Buf): Array[Byte] = {
    val (ss, ids, n) = b.topK()
    val bb = ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(ss(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKByScore.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKByScore.Buf(k)
    var i = 0
    while (i < n) { b.insert(bb.getDouble, bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "topk_by_score"
}

object TopKByScore {

  /** Growable (score, id) buffer that never holds more than 4k entries:
    * on overflow it sorts-and-truncates to the true top-k, then rejects
    * new entries not beating the kept threshold in O(1). */
  final class Buf(k: Int) {
    private val cap = math.max(4 * k, 32)
    private var ss = new Array[Double](math.min(cap, 1024))
    private var ids = new Array[Long](ss.length)
    private var n = 0
    // valid once a compaction has run: entries worse than (thS, thI)
    // can never enter the top-k again
    private var compacted = false
    private var thS = 0.0
    private var thI = 0L

    /** (j beats i) under (score desc, id asc) with NaN greatest — the
      * exact `row_number` order the window form used. */
    @inline private def beats(sA: Double, iA: Long, sB: Double, iB: Long)
        : Boolean = {
      val c = java.lang.Double.compare(sB, sA)
      c < 0 || (c == 0 && iA < iB)
    }

    def insert(s: Double, i: Long): Unit = {
      if (compacted && n >= k && !beats(s, i, thS, thI)) return
      if (n == ss.length) {
        if (n < cap) {
          val m = math.min(cap, n * 2)
          ss = java.util.Arrays.copyOf(ss, m)
          ids = java.util.Arrays.copyOf(ids, m)
        } else compact()
      }
      ss(n) = s; ids(n) = i; n += 1
    }

    def absorb(o: Buf): Unit = {
      val (os, oi, on) = (o.ss, o.ids, o.n)
      var j = 0
      while (j < on) { insert(os(j), oi(j)); j += 1 }
    }

    private def compact(): Unit = {
      sortPrefix()
      if (n > k) n = k
      if (n >= k) { thS = ss(n - 1); thI = ids(n - 1); compacted = true }
    }

    /** In-place sort of the live prefix by (score desc, id asc). */
    private def sortPrefix(): Unit = {
      val idx = Array.range(0, n).map(Integer.valueOf).toArray
      java.util.Arrays.sort(idx,
        new java.util.Comparator[Integer] {
          override def compare(a: Integer, b: Integer): Int = {
            val c = java.lang.Double.compare(ss(b), ss(a))
            if (c != 0) c else java.lang.Long.compare(ids(a), ids(b))
          }
        })
      val ns = new Array[Double](ss.length)
      val ni = new Array[Long](ids.length)
      var i = 0
      while (i < n) { ns(i) = ss(idx(i)); ni(i) = ids(idx(i)); i += 1 }
      ss = ns; ids = ni
    }

    /** Sorted, truncated view: (scores, ids, count). */
    def topK(): (Array[Double], Array[Long], Int) = {
      sortPrefix()
      if (n > k) n = k
      (ss, ids, n)
    }
  }
}
