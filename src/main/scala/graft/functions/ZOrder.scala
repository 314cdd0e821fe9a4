package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout.
  *
  * At 100 TB the dominant cost is the scan, and the scan is only prunable
  * along the physical sort order. A single-column sort clusters one
  * predicate dimension; `zorder2(x, y)` interleaves the bits of two
  * dimensions so that `repartitionByRange(zkey) + sortWithinPartitions
  * (zkey)` before the write yields files whose min/max ranges are tight in
  * BOTH dimensions — parquet footer stats then prune on either predicate.
  *
  * Pure `Column` bit arithmetic (5 shift-mask rounds per dimension, the
  * standard Morton spread) — whole-stage codegen'd, no UDF, no custom
  * expression needed, and exactly reproducible in any engine with 64-bit
  * integer ops (the DuckDB oracle replays it literally).
  *
  * Inputs are masked to their low 31 bits (callers pre-scale: subtract the
  * domain min, divide to a coarse grid if wider), so the interleaved key
  * occupies bits 0..61 and is always non-negative — the long ordering IS
  * the unsigned Morton ordering.
  */
object ZOrder {

  /** Spread the low 31 bits of `x` to even bit positions 0,2,4,..,60. */
  def spread31(x: Column): Column = {
    val v0 = x.bitwiseAND(lit(0x7FFFFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val v4 = v3.bitwiseOR(shiftleft(v3, 2)).bitwiseAND(lit(0x3333333333333333L))
    v4.bitwiseOR(shiftleft(v4, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Morton key of two dimensions: x on even bits, y on odd bits. */
  def zorder2(x: Column, y: Column): Column =
    spread31(x).bitwiseOR(shiftleft(spread31(y), 1))

  /** `zorder2` as a resolved Catalyst expression tree — the shape the SQL
    * function registry needs (a Column composition converts to unresolved
    * function nodes there). Identical math; same codegen'd bit ops. */
  def zorder2Expr(x: org.apache.spark.sql.catalyst.expressions.Expression,
                  y: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.LongType
    def and(a: Expression, m: Long) = BitwiseAnd(a, Literal(m))
    def step(v: Expression, s: Int, m: Long) =
      and(BitwiseOr(v, ShiftLeft(v, Literal(s))), m)
    def spread(e: Expression): Expression = {
      val v0 = and(Cast(e, LongType), 0x7FFFFFFFL)
      val v1 = step(v0, 16, 0x0000FFFF0000FFFFL)
      val v2 = step(v1, 8, 0x00FF00FF00FF00FFL)
      val v3 = step(v2, 4, 0x0F0F0F0F0F0F0F0FL)
      val v4 = step(v3, 2, 0x3333333333333333L)
      and(BitwiseOr(v4, ShiftLeft(v4, Literal(1))), 0x5555555555555555L)
    }
    BitwiseOr(spread(x), ShiftLeft(spread(y), Literal(1)))
  }

  /** Morton key of `n` dimensions (2 ≤ n ≤ 6): bit `b` of dimension `i`
    * lands at position `b*n + i`, using `63/n` bits per dimension so the
    * key stays in bits 0..62 (non-negative — the long ordering IS the
    * unsigned Morton ordering, same contract as `zorder2`).
    *
    * The round-7 manifest string+double stat lanes make 3-4-column
    * layouts practical for real lakes; this is the layout key for them.
    * Built as an OR-reduction of per-bit shift terms — for n=3 that is
    * 63 codegen'd bitwise ops, still branch-free scalar arithmetic (the
    * 2-D fast path keeps the 5-round shift-mask cascade; `zorderN(x, y)`
    * equals `zorder2(x, y)` bit-for-bit, property-tested). Engine-
    * portable: the DuckDB oracle replays the identical per-bit formula.
    *
    * Same pre-scaling contract as `zorder2`: inputs are masked to their
    * low `63/n` bits; callers subtract the domain min / divide to a
    * coarse grid first. */
  def zorderN(dims: Seq[Column]): Column = {
    require(dims.size >= 2 && dims.size <= 6,
      s"zorderN supports 2..6 dimensions, got ${dims.size}")
    if (dims.size == 2) return zorder2(dims(0), dims(1))
    val n = dims.size
    val bits = 63 / n
    dims.zipWithIndex.map { case (d, i) =>
      val v = d.cast("long").bitwiseAND(lit((1L << bits) - 1))
      (0 until bits).map { b =>
        shiftleft(shiftright(v, b).bitwiseAND(lit(1L)), b * n + i): Column
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Reference (row-at-a-time) `zorderN` for property tests. */
  def zorderNRef(xs: Seq[Long]): Long = {
    val n = xs.size
    if (n == 2) return zorder2Ref(xs(0), xs(1))
    val bits = 63 / n
    xs.zipWithIndex.map { case (x, i) =>
      val v = x & ((1L << bits) - 1)
      (0 until bits).map(b => ((v >> b) & 1L) << (b * n + i))
        .reduce(_ | _)
    }.reduce(_ | _)
  }

  /** Reference (row-at-a-time) spread for property tests. */
  def spread31Ref(x: Long): Long = {
    var v = x & 0x7FFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    (v | (v << 1)) & 0x5555555555555555L
  }

  def zorder2Ref(x: Long, y: Long): Long =
    spread31Ref(x) | (spread31Ref(y) << 1)
}
