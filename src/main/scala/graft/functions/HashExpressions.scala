package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen via a per-row call back into the expression's compiled
  * `nullSafeEval` loop (the standard reference-object pattern). Unlike
  * `CodegenFallback` this keeps the surrounding stage inside
  * WholeStageCodegen — neighbors stay fused and row batching survives —
  * while the hot inner loop runs the same compiled Scala as interpreted
  * mode, so results are bit-identical by construction. */
trait RefEvalCodegen { self: UnaryExpression =>
  /** Public bridge for generated code (nullSafeEval is protected). */
  final def compute(input: Any): Any = nullSafeEval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this,
      classOf[RefEvalCodegen].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val call = dataType match {
        case LongType => s"((java.lang.Long) $ref.compute($c)).longValue()"
        case _: ArrayType =>
          s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c)"
        case StringType =>
          s"(org.apache.spark.unsafe.types.UTF8String) $ref.compute($c)"
        case BinaryType => s"(byte[]) $ref.compute($c)"
        case other => throw new IllegalStateException(
          s"RefEvalCodegen: unsupported dataType $other")
      }
      s"${ev.value} = $call;"
    })
  }
}

/** Native Catalyst expressions for the hash-sketch hot paths.
  *
  * The composed higher-order-function versions (64 `aggregate` lambdas for
  * SimHash, 32 `transform` lambdas for MinHash) evaluate interpreted, one
  * lambda invocation per element per hash — measured 8-11s each at sf0.1.
  * These single-pass native loops do the same arithmetic in one traversal
  * of the token array per row. Both reuse Spark's XxHash64Function so
  * results are bit-identical to the `xxhash64()` builtin.
  */

/** 64-bit SimHash over an array<string> of tokens: per bit, +1/-1 vote from
  * each token's xxhash64(seed=42); bit set where the vote sum is positive. */
case class SimHash64(child: Expression)
    extends UnaryExpression with RefEvalCodegen {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
  override def prettyName: String = "simhash64"
}

/** MinHash signature over an array<string> of shingles: `numHashes`
  * independent permutations h_i(s) = (a_i * base(s) + b_i) mod (2^31-1)
  * with base(s) = xxhash64(s) mod (2^31-1); returns array<long> of minima.
  * Single pass: base hash computed once per shingle, k affine transforms
  * in a native inner loop. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with RefEvalCodegen {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature requires array<string>, got $other")
    }
  }

  @transient private lazy val (as, bs) = {
    val a = new Array[Long](numHashes)
    val b = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      a(i) = Math.floorMod(2862933555777941757L * (i + 1) + 3037000493L,
        HashExpressions.P31 - 1) + 1
      b(i) = Math.floorMod(4354685564936845319L * (i + 1) + 32452843L,
        HashExpressions.P31)
      i += 1
    }
    (a, b)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = Math.floorMod(
          XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L),
          HashExpressions.P31)
        var k = 0
        while (k < numHashes) {
          val v = Math.floorMod(as(k) * base + bs(k), HashExpressions.P31)
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
  override def prettyName: String = "minhash_signature"
}

/** Distinct word n-gram shingles of a space-tokenized string, single native
  * pass. Semantics identical to
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ', slice(split(text,' '), i, n))))`
  * (and the DuckDB oracle): empty tokens from runs of spaces are preserved,
  * docs shorter than n tokens yield one whole-doc shingle, first-occurrence
  * order. The composed version evaluates interpreted lambdas per element —
  * this is the hot path of shingle dedup at scale. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with RefEvalCodegen {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles requires string, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.split(" ", -1)
    val out = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]
    if (tokens.length <= n) {
      out.add(org.apache.spark.unsafe.types.UTF8String
        .fromString(tokens.mkString(" ")))
    } else {
      val sb = new java.lang.StringBuilder
      var i = 0
      val last = tokens.length - n
      while (i <= last) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(tokens(i + j))
          j += 1
        }
        out.add(org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString))
        i += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
  override def prettyName: String = "word_shingles"
}

/** Order-insensitive document fingerprint: md5 over the sorted distinct
  * space-tokens of the input, single native pass. Byte-identical to
  * `md5(array_join(array_sort(array_distinct(split(text, ' '))), ' '))`
  * (and the DuckDB oracle): distinct keeps first occurrence, sort is
  * UTF8-binary order, join with single spaces, lowercase applied by the
  * caller. */
case class TokenSetFingerprint(child: Expression)
    extends UnaryExpression with RefEvalCodegen {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_set_fingerprint requires string, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.unsafe.types.UTF8String
    val tokens = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val set = new java.util.TreeSet[UTF8String]() // UTF8 binary order
    var i = 0
    while (i < tokens.length) {
      set.add(UTF8String.fromString(tokens(i))); i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val it = set.iterator()
    var first = true
    while (it.hasNext) {
      if (!first) md.update(' '.toByte)
      md.update(it.next().getBytes)
      first = false
    }
    val hex = md.digest().map("%02x".format(_)).mkString
    UTF8String.fromString(hex)
  }

  override protected def withNewChildInternal(c: Expression): TokenSetFingerprint =
    copy(child = c)
  override def prettyName: String = "token_set_fingerprint"
}

/** Signed-random-projection (SRP) LSH band buckets over an `array<double>`
  * embedding: `bands * bitsPerBand` deterministic Gaussian hyperplanes;
  * bit = sign(v · r_i); returns `array<long>` of length `bands`, element b
  * packing that band's `bitsPerBand` sign bits into one bucket value.
  * Collision probability per bit is 1 - θ/π (θ = angle between vectors),
  * so banding behaves exactly like MinHash banding but for cosine
  * similarity — the candidate layer is an equi-join on (band, bucket),
  * never an all-pairs cross join.
  *
  * Hyperplanes are derived from splitmix64 streams keyed by (bit, dim) and
  * Box-Muller'd through StrictMath — bit-reproducible across JVMs, tasks,
  * and replays; no fit/state to ship. Plane matrices are cached per
  * (nBits, dim) process-wide.
  */
case class SrpBandBuckets(child: Expression, bands: Int, bitsPerBand: Int)
    extends UnaryExpression with RefEvalCodegen {
  require(bands >= 1 && bitsPerBand >= 1 && bitsPerBand <= 62,
    "bands >= 1 and 1 <= bitsPerBand <= 62")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"srp_band_buckets requires array<double>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val nBits = bands * bitsPerBand
    val planes = SrpBandBuckets.planes(nBits, dim)
    val v = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (!arr.isNullAt(j)) v(j) = arr.getDouble(j)
      j += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var r = 0
      while (r < bitsPerBand) {
        val row = (b * bitsPerBand + r) * dim
        var s = 0.0
        var k = 0
        while (k < dim) { s += v(k) * planes(row + k); k += 1 }
        bucket = (bucket << 1) | (if (s > 0) 1L else 0L)
        r += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): SrpBandBuckets =
    copy(child = c)
  override def prettyName: String = "srp_band_buckets"
}

object SrpBandBuckets {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** (0,1) uniform from the top 53 bits of a splitmix64 stream. */
  private def unit(seed: Long): Double =
    ((splitmix64(seed) >>> 11) + 0.5) * 1.1102230246251565e-16

  /** Flattened nBits×dim Gaussian plane matrix, deterministic in (bit, dim)
    * so adding bands extends rather than reshuffles existing planes. */
  private[functions] def planes(nBits: Int, dim: Int): Array[Double] =
    cache.computeIfAbsent((nBits, dim), { _ =>
      val m = new Array[Double](nBits * dim)
      var i = 0
      while (i < nBits) {
        var j = 0
        while (j < dim) {
          val s = i.toLong * 0x100000001L + j
          val u1 = unit(2L * s)
          val u2 = unit(2L * s + 1L)
          m(i * dim + j) = StrictMath.sqrt(-2.0 * StrictMath.log(u1)) *
            StrictMath.cos(2.0 * StrictMath.PI * u2)
          j += 1
        }
        i += 1
      }
      m
    })
}

object HashExpressions {
  val P31: Long = 2147483647L // Mersenne prime 2^31-1

  import org.apache.spark.sql.graft.bridge

  def simhash64(tokens: Column): Column =
    bridge.column(SimHash64(bridge.expression(tokens)))

  def minhashSignature(shingles: Column, numHashes: Int): Column =
    bridge.column(MinHashSignature(bridge.expression(shingles), numHashes))

  def wordShingles(text: Column, n: Int): Column =
    bridge.column(WordShingles(bridge.expression(text), n))

  def tokenSetFingerprint(text: Column): Column =
    bridge.column(TokenSetFingerprint(bridge.expression(text)))

  def srpBandBuckets(vec: Column, bands: Int, bitsPerBand: Int): Column =
    bridge.column(SrpBandBuckets(bridge.expression(vec), bands, bitsPerBand))
}
