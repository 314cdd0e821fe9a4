package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL registration of the engine's custom expressions so `spark.sql`
  * users get them too: `simhash64(tokens)`, `minhash_signature(shingles,
  * k)`, `word_shingles(text, n)`.
  *
  * Two entry points: `GraftFunctions.register(spark)` for an existing
  * session, or `.withExtensions(new GraftExtensions)` at build time.
  */
object GraftFunctions {

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // optional trailing boolean selects the md5 (engine-portable) base
    // hash, defaulting to the same mode the Scala pipeline defaults use so
    // SQL users cross-checking dedup output get matching hashes
    "simhash64" -> { exprs =>
      SimHash64(exprs.head, boolArg(exprs, 1, "simhash64", default = true))
    },
    "minhash_signature" -> { exprs =>
      MinHashSignature(exprs.head, intArg(exprs, 1, "minhash_signature"),
        boolArg(exprs, 2, "minhash_signature", default = false))
    },
    "word_shingles" -> { exprs =>
      WordShingles(exprs.head, intArg(exprs, 1, "word_shingles"))
    },
    "srp_band_buckets" -> { exprs =>
      SrpBandBuckets(exprs.head, intArg(exprs, 1, "srp_band_buckets"),
        intArg(exprs, 2, "srp_band_buckets"))
    },
    // `jaro_winkler(a, b)` — ER name-similarity scorer; DuckDB-identical
    "jaro_winkler" -> { exprs =>
      val b = exprs.lift(1).getOrElse(throw new IllegalArgumentException(
        "jaro_winkler requires two string arguments"))
      JaroWinkler(exprs.head, b)
    },
    "dot_product" -> { exprs =>
      import org.apache.spark.sql.catalyst.expressions.Cast
      import org.apache.spark.sql.types.{ArrayType, DoubleType}
      val b = exprs.lift(1).getOrElse(throw new IllegalArgumentException(
        "dot_product requires two array arguments"))
      DotProduct(Cast(exprs.head, ArrayType(DoubleType)),
        Cast(b, ArrayType(DoubleType)))
    },
    // Morton interleave as SQL: `zorder2(x, y)` — the same codegen'd bit
    // arithmetic as the Column API, built as a resolved expression tree
    "zorder2" -> { exprs =>
      val b = exprs.lift(1).getOrElse(throw new IllegalArgumentException(
        "zorder2 requires two integer arguments"))
      ZOrder.zorder2Expr(exprs.head, b)
    },
    // `hashed_bow_logit(text[, buckets])` — the classifier scorer; pass
    // pre-lowered text (the Scala API lowers for you)
    "hashed_bow_logit" -> { exprs =>
      HashedBowLogit(exprs.head,
        if (exprs.length > 1) intArg(exprs, 1, "hashed_bow_logit") else 64)
    })

  private def intArg(exprs: Seq[Expression], i: Int, fn: String): Int =
    exprs.lift(i) match {
      case Some(org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _)) => v
      case other => throw new IllegalArgumentException(
        s"$fn requires a literal int argument at position ${i + 1}, got $other")
    }

  private def boolArg(exprs: Seq[Expression], i: Int, fn: String,
                      default: Boolean): Boolean =
    exprs.lift(i) match {
      case None => default
      case Some(org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _)) => v
      case other => throw new IllegalArgumentException(
        s"$fn position ${i + 1} must be a literal boolean, got $other")
    }

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

/** Session-builder extension — the single registration entry point for
  * everything the engine adds to a session: the custom SQL functions AND
  * the custom planner strategies (`graft.plans.AsOfJoinStrategy`).
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    e.injectFunction((FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head, md5Base = true)))
    e.injectFunction((FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) => WordShingles(exprs.head,
        exprs(1).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
          .value.asInstanceOf[Int])))
    e.injectFunction((FunctionIdentifier("hashed_bow_logit"),
      new ExpressionInfo(classOf[HashedBowLogit].getName, "hashed_bow_logit"),
      (exprs: Seq[Expression]) => HashedBowLogit(exprs.head,
        if (exprs.length > 1)
          exprs(1).asInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]
            .value.asInstanceOf[Int]
        else 64)))
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
    e.injectOptimizerRule(_ => graft.plans.SummaryRewrite)
  }
}
