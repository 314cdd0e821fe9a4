package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form OLS on integer-quantized inputs — the "learned quality
  * filter refresh" building block: fit a small linear model over corpus
  * features in ONE aggregate, hold the coefficients as driver state
  * (model-scale, like k-means centroids and the PCA components), and
  * apply them corpus-wide as literals.
  *
  * Determinism is the whole design: features and the micro-quantized
  * target are exact int64/decimal(38,0) moments (a double sum's
  * partition order could flip low bits of X'X and make the fit
  * irreproducible — the PCA moment discipline), so same corpus → same
  * normal equations → same Gaussian elimination → bit-identical
  * coefficients, which is what lets a DuckDB oracle replay the SCORING
  * pass with the coefficients exported as double literals (the
  * dynamic-oracle pattern, COVERAGE.md preamble).
  *
  * Scale: the moment aggregate is one corpus pass, partial-aggregatable
  * ((k+1)(k+2)/2 decimal sums); the solve is a k×k driver computation.
  * At 100 TB nothing but the k² scalars crosses to the driver. */
object Regression {

  /** Fit y ≈ β0 + Σ βi·xi by OLS. `xs` must be integer-valued columns
    * (cast internally to decimal for exact moments); `yMicro` an
    * integer-quantized target (e.g. `floor(metric·1e6 + 0.5)`). Returns
    * β of length k+1 (intercept first). Overflow: moments accumulate in
    * decimal(38,0) — exact to Σx·x ≤ 1e38. */
  def olsFit(df: DataFrame, yMicro: Column, xs: Seq[Column]): Array[Double] = {
    val k = xs.size
    require(k >= 1, "olsFit needs at least one feature")
    // design vector z = (1, x1..xk, y): all pairwise moments in one pass
    val z: Seq[Column] = lit(1L) +: xs :+ yMicro
    val names = (0 to k + 1).map(i => s"z$i")
    val prepared = df.select(z.zip(names).map { case (c, n) =>
      c.cast("decimal(38,0)").as(n)
    }: _*)
    val momentCols = for {
      i <- 0 to k + 1; j <- i to k + 1
    } yield sum(col(names(i)) * col(names(j)))
      .cast("decimal(38,0)").as(s"m_${i}_$j")
    val row = prepared.agg(momentCols.head, momentCols.tail: _*).head()
    val m = Array.ofDim[Double](k + 2, k + 2)
    var idx = 0
    for (i <- 0 to k + 1; j <- i to k + 1) {
      val v = row.getDecimal(idx).doubleValue()
      m(i)(j) = v; m(j)(i) = v; idx += 1
    }
    // normal equations: A β = b with A = Z'Z (features incl. intercept),
    // b = Z'y — solve by Gaussian elimination with partial pivoting
    // (deterministic: pivoting on exact-moment-derived doubles)
    val n = k + 1
    val a = Array.tabulate(n, n)((i, j) => m(i)(j))
    val b = Array.tabulate(n)(i => m(i)(k + 1))
    for (c <- 0 until n) {
      var p = c
      for (r <- c + 1 until n) if (math.abs(a(r)(c)) > math.abs(a(p)(c))) p = r
      if (p != c) { val t = a(p); a(p) = a(c); a(c) = t
        val tb = b(p); b(p) = b(c); b(c) = tb }
      require(math.abs(a(c)(c)) > 0.0,
        s"singular normal equations at pivot $c (collinear features)")
      for (r <- c + 1 until n) {
        val f = a(r)(c) / a(c)(c)
        for (cc <- c until n) a(r)(cc) -= f * a(c)(cc)
        b(r) -= f * b(c)
      }
    }
    val beta = new Array[Double](n)
    for (c <- n - 1 to 0 by -1) {
      var s = b(c)
      for (cc <- c + 1 until n) s -= a(c)(cc) * beta(cc)
      beta(c) = s / a(c)(c)
    }
    beta
  }

  /** Apply a fitted β as LITERALS: β0 + Σ βi·xi, left-to-right — the op
    * order the oracle must mirror verbatim. */
  def score(beta: Array[Double], xs: Seq[Column]): Column = {
    require(beta.length == xs.size + 1)
    xs.zipWithIndex.foldLeft(lit(beta(0))) { case (acc, (x, i)) =>
      acc + lit(beta(i + 1)) * x.cast("double")
    }
  }
}
