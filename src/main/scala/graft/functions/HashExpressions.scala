package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
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
        case DoubleType =>
          s"((java.lang.Double) $ref.compute($c)).doubleValue()"
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

/** SimHash over an array<string> of tokens: per bit, +1/-1 vote from each
  * token's hash; bit set where the vote sum is positive.
  *
  * Two base-hash modes: xxhash64(seed=42) gives 64 bits (fastest); md5
  * (`md5Base=true`) gives 60 bits — the first 15 hex digits of the digest,
  * exactly `CAST(CONCAT('0x', substr(md5(t), 1, 15)) AS BIGINT)` in DuckDB —
  * making the whole SimHash pipeline engine-portable and oracle-checkable. */
case class SimHash64(child: Expression, md5Base: Boolean = false)
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

  private val nBits = if (md5Base) 60 else 64

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](nBits)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h =
          if (md5Base) HashExpressions.md5Base60(s.getBytes)
          else XxHash64Function.hash(s, StringType, 42L)
        var b = 0
        while (b < nBits) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < nBits) { if (votes(b) > 0) out |= (1L << b); b += 1 }
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
  * in a native inner loop.
  *
  * With `md5Base=true` the base hash is the md5-derived 60-bit value
  * (`HashExpressions.md5Base60`) mod 2^31-1 instead of xxhash64 — identical
  * recall properties, but reproducible in any engine with an md5 function,
  * so signature-valued outputs (e.g. corpus-level similarity) get full
  * DuckDB oracles. The affine constants are in the companion
  * (`MinHashSignature.affineConstants`) so oracle SQL embeds the exact
  * same family. */
case class MinHashSignature(child: Expression, numHashes: Int,
                            md5Base: Boolean = false)
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

  @transient private lazy val (as, bs) =
    MinHashSignature.affineConstants(numHashes)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val raw =
          if (md5Base) HashExpressions.md5Base60(s.getBytes)
          else XxHash64Function.hash(s, StringType, 42L)
        val base = Math.floorMod(raw, HashExpressions.P31)
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

object MinHashSignature {
  /** The universal-hash family constants, shared verbatim with the DuckDB
    * oracle SQL (which embeds them as literals): a_i ∈ [1, p-1],
    * b_i ∈ [0, p-1] from a fixed 64-bit LCG mix of the index. The wrapping
    * 64-bit multiply is intentional — Java long overflow wraps, and the
    * oracle side never recomputes it (it interpolates the resulting
    * constants). */
  def affineConstants(numHashes: Int): (Array[Long], Array[Long]) = {
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
}

/** PCA/OPQ moment elements of a double vector in ONE native pass:
  * d mean entries (i, -1, v_i) followed by the upper-triangle cross
  * products (i, j, v_i·v_j), i <= j — the rows `Similarity.momentAgg`
  * explodes into its d×d moment aggregate. Value-identical to the
  * composed nested transform/flatten/concat form (same products, same
  * order), which evaluated TWO interpreted lambda levels per element —
  * ~2,100 interpreted closures per 64-dim row, the dominant cost of the
  * emb_pca_* family before this expression existed. */
case class VectorMoments(child: Expression)
    extends UnaryExpression with RefEvalCodegen {
  private val elemType = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("x", DoubleType, nullable = false)))
  override def dataType: DataType = ArrayType(elemType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_moments requires array<double>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val d = arr.numElements()
    val v = new Array[Double](d)
    var i = 0
    while (i < d) { v(i) = arr.getDouble(i); i += 1 }
    val out = new Array[Any](d + d * (d + 1) / 2)
    i = 0
    while (i < d) {
      out(i) = org.apache.spark.sql.catalyst.InternalRow(i, -1, v(i))
      i += 1
    }
    var k = d
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out(k) = org.apache.spark.sql.catalyst.InternalRow(i, j, v(i) * v(j))
        k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): VectorMoments =
    copy(child = c)
  override def prettyName: String = "vector_moments"
}

/** ORDERED, NON-distinct word n-grams of a space-tokenized string, single
  * native pass — the BM25/posting-grain sibling of WordShingles (term
  * frequency matters, so duplicates must survive). Semantics identical to
  * `transform(sequence(1, greatest(size(toks)-(n-1), 1)), i -> concat_ws(' ', slice(toks, i, n)))`
  * over `split(text, ' ')`: empty tokens from runs of spaces are
  * preserved, docs shorter than n tokens yield one whole-doc gram,
  * positional order. The composed version evaluates an interpreted
  * lambda + array slice PER POSITION — measured 19.3 s of a 20 s
  * 10x-corpus BM25 retrieval before this expression existed. */
case class WordNgrams(child: Expression, n: Int)
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
          s"word_ngrams requires string, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.split(" ", -1)
    if (tokens.length <= n) {
      new GenericArrayData(Array[Any](
        org.apache.spark.unsafe.types.UTF8String
          .fromString(tokens.mkString(" "))))
    } else {
      val last = tokens.length - n
      val out = new Array[Any](last + 1)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= last) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(tokens(i + j))
          j += 1
        }
        out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): WordNgrams =
    copy(child = c)
  override def prettyName: String = "word_ngrams"
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
/** Hashed bag-of-words linear-model logit over a (pre-lowered) text
  * string: tokenize on single spaces, md5-hash each token into one of
  * `buckets` buckets, sum the integer centi-weights `(b*37) % 101 - 50`,
  * and return `sum / (100.0 * max(nTokens, 1))` — the mean logit, still
  * UNROUNDED (callers snap with `round(..., 6)` so the engine-portable
  * decimal rounding stays in one place). One native pass per document;
  * the composed `aggregate(transform(...))` form evaluates two
  * interpreted lambdas per token and md5's through the Column API.
  * Bit-identical to the composed form by construction (same md5-derived
  * bucket, same integer arithmetic, one double division). */
case class HashedBowLogit(child: Expression, buckets: Int)
    extends UnaryExpression with RefEvalCodegen {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hashed_bow_logit requires string, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.unsafe.types.UTF8String
    val tokens = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    var sum = 0L
    var i = 0
    while (i < tokens.length) {
      val b = HashExpressions.md5Base60(
        tokens(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)) % buckets
      sum += (b * 37) % 101 - 50
      i += 1
    }
    sum / (100.0 * math.max(tokens.length, 1))
  }

  override protected def withNewChildInternal(c: Expression): HashedBowLogit =
    copy(child = c)
  override def prettyName: String = "hashed_bow_logit"
}

/** Per-gram 60-bit md5 hashes of word n-grams in document order —
  * `array<long>`, one element per gram, value identical to
  * `conv(substring(md5(gram), 1, 15), 16, 10)` over the gram string (and
  * to DuckDB's `CAST(CONCAT('0x', substr(md5(g),1,15)) AS BIGINT)`), so
  * winnowing selections built on it stay engine-portable. Gram layout
  * matches `TextAnalysis.ngrams`: split on single spaces, docs shorter
  * than n tokens yield ONE truncated whole-doc gram, multiplicity and
  * order preserved (`posexplode` recovers the gram position).
  *
  * One native pass per doc replaces the composed
  * `transform(sequence(...), slice/concat_ws)` + `conv(substring(md5))`
  * chain, which evaluates interpreted lambdas per token and round-trips
  * every gram through a hex string — measured 2.2x on the winnowing
  * scan at sf0.1. */
case class WordGramHashes(child: Expression, n: Int)
    extends UnaryExpression with RefEvalCodegen {
  require(n >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_gram_hashes requires string, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.split(" ", -1)
    if (tokens.length <= n) {
      new GenericArrayData(Array[Any](
        HashExpressions.md5Base60(tokens.mkString(" ")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))))
    } else {
      val out = new Array[Any](tokens.length - n + 1)
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
        out(i) = HashExpressions.md5Base60(
          sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): WordGramHashes =
    copy(child = c)
  override def prettyName: String = "word_gram_hashes"
}

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
    // sort-then-skip-adjacent-duplicates beats a TreeSet (one array, no
    // node allocations); UTF8String compares in binary order, identical
    // to the TreeSet ordering and DuckDB's list_sort
    val arr = new Array[UTF8String](tokens.length)
    var i = 0
    while (i < tokens.length) {
      arr(i) = UTF8String.fromString(tokens(i)); i += 1
    }
    java.util.Arrays.sort(arr,
      java.util.Comparator.naturalOrder[UTF8String]())
    val md = HashExpressions.md5()
    var first = true
    i = 0
    while (i < arr.length) {
      if (i == 0 || arr(i) != arr(i - 1)) {
        if (!first) md.update(' '.toByte)
        md.update(arr(i).getBytes)
        first = false
      }
      i += 1
    }
    UTF8String.fromString(HashExpressions.toHex(md.digest()))
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
  * Hyperplanes are Rademacher (±1) with the sign drawn from the md5-derived
  * 60-bit hash of "bit_dim" — bit-reproducible across JVMs, tasks, replays,
  * AND other engines (DuckDB rebuilds the identical planes from its own md5,
  * so SRP-signature outputs are fully oracle-checkable). ±1 entries also
  * keep the projection exact in floating point: each product is ±v_k with no
  * rounding, so the sign of the left-to-right sum is engine-invariant.
  * Sign-projection quality matches Gaussian planes for moderate dimensions
  * (Achlioptas 2003-style database-friendly projections; same 1 - θ/π bit
  * collision law to first order). Plane matrices are cached per (nBits, dim)
  * process-wide.
  */
/** Native dot product over two `array<double>` columns: the exact same
  * left-to-right fold as the composed
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — bit-identical results, so
  * every DuckDB `list_sum(list_transform(...))` oracle still matches —
  * minus the per-element interpreted-lambda dispatch, which dominates the
  * similarity scans (two lambda invocations per dimension per pair).
  * Mismatched lengths or null elements yield null, mirroring zip_with's
  * null padding flowing through the sum. */
/** Shannon entropy (bits) of an array<string> of symbols — the native
  * single-pass twin of the composed HOF form
  * `(ln n − Σ_sorted count·ln count / n) / ln 2` rounded to 4 decimals.
  * The composed version evaluates O(distinct × len) interpreted lambda
  * calls per row (a filter scan per distinct symbol — measured ~6.7 s
  * at sf0.1); this counts in ONE TreeMap pass and folds the counts in
  * UTF8String binary order, the identical addition sequence to
  * `array_sort(array_distinct(...))`, so results are bit-identical
  * (spec-pinned over the corpus). Null elements are skipped — producers
  * (split / tokens) never emit them. */
case class SymbolEntropyBits(child: Expression)
    extends UnaryExpression with RefEvalCodegen {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"symbol_entropy_bits requires array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val total = arr.numElements()
    val counts = new java.util.TreeMap[
      org.apache.spark.unsafe.types.UTF8String, Long]()
    var i = 0
    var n = 0L
    while (i < total) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val prev = counts.get(s)
        counts.put(s, if (prev == null) 1L else prev + 1L)
        n += 1L
      }
      i += 1
    }
    val nd = math.max(n, 1L).toDouble
    var s = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      s += c * math.log(c)
    }
    val bits = (math.log(nd) - s / nd) / 0.6931471805599453
    // Spark Round(DoubleType) semantics: BigDecimal HALF_UP at scale 4
    java.lang.Double.valueOf(java.math.BigDecimal.valueOf(bits)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue())
  }

  override protected def withNewChildInternal(
      newChild: Expression): SymbolEntropyBits = copy(child = newChild)
  override def prettyName: String = "symbol_entropy_bits"
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product requires two array<double>, got $other")
    }
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Every generated local goes through ctx.freshName: several DotProducts
    // routinely share one codegen scope (cosine is three dots, the PQ
    // distance dot(a,a)+dot(b,b)-2*dot(a,b) is three more) and a fixed
    // local name would collide, failing janino compilation and dropping
    // the whole projection to interpreted mode.
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("graftDotN")
      val i = ctx.freshName("graftDotI")
      val s = ctx.freshName("graftDotS")
      s"""final int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotProduct = copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** |A ∩ B| over two SORTED `array<long>` columns via a linear merge —
  * no per-row hash-set allocation, unlike `array_intersect`. Inputs must
  * be sorted ascending with distinct elements (the shape
  * `array_sort(collect_set(...))` and sorted-hash shingle tables
  * produce); the count is then identical to
  * `size(array_intersect(a, b))`. Null elements are not expected (both
  * producers emit non-null longs); a null array null-propagates. */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_long_intersect_count requires two array<long>, got $other")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    java.lang.Long.valueOf(c)
  }

  /** Public bridge for generated code (nullSafeEval is protected). */
  def compute(a: Any, b: Any): Any = nullSafeEval(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftIsect", this,
      classOf[SortedLongIntersectCount].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = ((java.lang.Long) $ref.compute($a, $b)).longValue();")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedLongIntersectCount =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_long_intersect_count"
}

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

/** Multi-probe SRP buckets (Lv et al., VLDB 2007 applied to sign-random-
  * projection): per band, the base bucket followed by `flips` probe
  * buckets, each obtained by flipping ONE of the band's lowest-|margin|
  * bits (the projections closest to their hyperplane — the bits most
  * likely to differ on a true near neighbor). Output is a flat
  * array<long> of length bands*(flips+1); element i belongs to band
  * i/(flips+1). Margin ties break on bit index, so the probe set is
  * deterministic and the DuckDB oracle rebuilds it bit-identically
  * (row_number OVER (ORDER BY abs(s), bit)).
  *
  * Same plane matrix as SrpBandBuckets: a corpus indexed with plain
  * band buckets is probed by this expression's output with NO reindexing
  * — multi-probe is a query-side-only recall knob. */
case class SrpProbeBuckets(child: Expression, bands: Int, bitsPerBand: Int,
                           flips: Int)
    extends UnaryExpression with RefEvalCodegen {
  require(bands >= 1 && bitsPerBand >= 1 && bitsPerBand <= 62,
    "bands >= 1 and 1 <= bitsPerBand <= 62")
  require(flips >= 0 && flips < bitsPerBand,
    "0 <= flips < bitsPerBand (each probe flips one distinct bit)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"srp_probe_buckets requires array<double>, got $other")
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
    val perBand = flips + 1
    val out = new Array[Long](bands * perBand)
    val margin = new Array[Double](bitsPerBand)
    val order = new Array[Int](bitsPerBand)
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
        margin(r) = math.abs(s)
        order(r) = r
        r += 1
      }
      out(b * perBand) = bucket
      // selection of the `flips` lowest (|margin|, bit) — bitsPerBand is
      // tiny (<= 62), so an insertion sort of indices is the whole cost
      var i = 1
      while (i < bitsPerBand) {
        val oi = order(i)
        var p = i - 1
        while (p >= 0 && (margin(order(p)) > margin(oi) ||
          (margin(order(p)) == margin(oi) && order(p) > oi))) {
          order(p + 1) = order(p); p -= 1
        }
        order(p + 1) = oi
        i += 1
      }
      var t = 0
      while (t < flips) {
        out(b * perBand + t + 1) =
          bucket ^ (1L << (bitsPerBand - 1 - order(t)))
        t += 1
      }
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): SrpProbeBuckets =
    copy(child = c)
  override def prettyName: String = "srp_probe_buckets"
}

object SrpBandBuckets {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]

  /** Flattened nBits×dim Rademacher plane matrix: entry (i, j) is +1.0 when
    * the md5-derived 60-bit hash of "i_j" is odd, else -1.0 — exactly
    * `CASE WHEN CAST(CONCAT('0x', substr(md5(i || '_' || j), 1, 15))
    * AS BIGINT) % 2 = 1 THEN 1.0 ELSE -1.0 END` in the DuckDB oracles.
    * Deterministic in (bit, dim) so adding bands extends rather than
    * reshuffles existing planes. */
  private[functions] def planes(nBits: Int, dim: Int): Array[Double] =
    cache.computeIfAbsent((nBits, dim), { _ =>
      val m = new Array[Double](nBits * dim)
      var i = 0
      while (i < nBits) {
        var j = 0
        while (j < dim) {
          val h = HashExpressions.md5Base60(
            s"${i}_$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          m(i * dim + j) = if ((h & 1L) == 1L) 1.0 else -1.0
          j += 1
        }
        i += 1
      }
      m
    })
}

object HashExpressions {
  val P31: Long = 2147483647L // Mersenne prime 2^31-1

  /** First 15 hex digits of md5 as a non-negative 60-bit long — the
    * engine-portable base hash, equal to DuckDB's
    * `CAST(CONCAT('0x', substr(md5(x), 1, 15)) AS BIGINT)`. Computed
    * without hex-string round-tripping: 16 hex digits are the first 8
    * digest bytes big-endian; dropping the 16th digit is `>>> 4`. */
  // digest(bytes) resets the instance, so a per-thread digest is safe and
  // avoids a getInstance allocation per token in the hot dedup loops
  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** reset() on acquisition: if a previous eval on this pooled thread
    * aborted between update() calls (task kill, OOM), the digest would
    * otherwise carry that partial input into the next hash. */
  private[functions] def md5(): java.security.MessageDigest = {
    val md = md5Local.get()
    md.reset()
    md
  }

  private val HEX = "0123456789abcdef".toCharArray

  private[functions] def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def md5Base60(bytes: Array[Byte]): Long = {
    val d = md5().digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  import org.apache.spark.sql.graft.bridge

  def simhash64(tokens: Column, md5Base: Boolean = false): Column =
    bridge.column(SimHash64(bridge.expression(tokens), md5Base))

  def minhashSignature(shingles: Column, numHashes: Int,
                       md5Base: Boolean = false): Column =
    bridge.column(MinHashSignature(bridge.expression(shingles), numHashes,
      md5Base))

  def wordShingles(text: Column, n: Int): Column =
    bridge.column(WordShingles(bridge.expression(text), n))

  def wordNgrams(text: Column, n: Int): Column =
    bridge.column(WordNgrams(bridge.expression(text), n))

  def vectorMoments(v: Column): Column =
    bridge.column(VectorMoments(bridge.expression(v)))

  def wordGramHashes(text: Column, n: Int): Column =
    bridge.column(WordGramHashes(bridge.expression(text), n))

  def sortedLongIntersectCount(a: Column, b: Column): Column =
    bridge.column(SortedLongIntersectCount(bridge.expression(a),
      bridge.expression(b)))

  def tokenSetFingerprint(text: Column): Column =
    bridge.column(TokenSetFingerprint(bridge.expression(text)))

  def hashedBowLogit(text: Column, buckets: Int): Column =
    bridge.column(HashedBowLogit(bridge.expression(text), buckets))

  def symbolEntropyBits(symbols: Column): Column =
    bridge.column(SymbolEntropyBits(bridge.expression(symbols)))

  def srpBandBuckets(vec: Column, bands: Int, bitsPerBand: Int): Column =
    bridge.column(SrpBandBuckets(bridge.expression(vec), bands, bitsPerBand))

  def srpProbeBuckets(vec: Column, bands: Int, bitsPerBand: Int,
                      flips: Int): Column =
    bridge.column(SrpProbeBuckets(bridge.expression(vec), bands, bitsPerBand,
      flips))

  /** Per-group bounded top-k — `array<struct<score,id>>` holding the
    * first k rows under (score desc, id asc), `row_number`-identical but
    * partial-aggregatable (map-side combine keeps k per group per task
    * instead of shuffling + sorting every candidate). See TopKByScore. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    bridge.column(TopKByScore(bridge.expression(score),
      bridge.expression(id), k).toAggregateExpression())

  /** Inputs pass through a Cast to array<double> so float embeddings (the
    * storage type) and other numeric arrays keep working, exactly like the
    * composed zip_with fold's implicit lift; the optimizer strips the cast
    * when the input is already array<double>. (AbstractDataType is
    * private[sql], so ImplicitCastInputTypes is not an option here.) */
  def dotProduct(a: Column, b: Column): Column =
    bridge.column(DotProduct(
      org.apache.spark.sql.catalyst.expressions.Cast(bridge.expression(a),
        ArrayType(DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Cast(bridge.expression(b),
        ArrayType(DoubleType))))
}
