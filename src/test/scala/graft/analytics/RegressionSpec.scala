package graft.analytics

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RegressionSpec extends SparkSuite {
  import spark.implicits._

  test("olsFit recovers an exactly-linear relation (planted " +
    "y = 5 + 3·x1 − 2·x2, zero residual → β exact to fp solve)") {
    val rows = for (i <- 1L to 50L) yield {
      val x1 = i % 11; val x2 = (i * 7) % 13
      (x1, x2, 5L + 3L * x1 - 2L * x2)
    }
    val df = rows.toDF("x1", "x2", "y")
    val beta = Regression.olsFit(df, col("y"), Seq(col("x1"), col("x2")))
    assert(math.abs(beta(0) - 5.0) < 1e-9 &&
      math.abs(beta(1) - 3.0) < 1e-9 &&
      math.abs(beta(2) + 2.0) < 1e-9, beta.toSeq)
  }

  test("olsFit is replay-deterministic: two fits over a shuffled frame " +
    "yield bit-identical coefficients (exact decimal moments, not " +
    "order-dependent double sums)") {
    val rows = (1L to 500L).map(i =>
      (i % 31, (i * 13) % 17, (i * i) % 1000))
    val df = rows.toDF("x1", "x2", "y")
    val b1 = Regression.olsFit(df, col("y"), Seq(col("x1"), col("x2")))
    val b2 = Regression.olsFit(df.repartition(7).sortWithinPartitions("x2"),
      col("y"), Seq(col("x1"), col("x2")))
    assert(b1.toSeq == b2.toSeq,
      s"order-dependent fit: ${b1.toSeq} vs ${b2.toSeq}")
  }

  test("olsFit rejects collinear features instead of returning garbage") {
    val df = (1L to 20L).map(i => (i, 2 * i, i)).toDF("x1", "x2", "y")
    intercept[IllegalArgumentException] {
      Regression.olsFit(df, col("y"), Seq(col("x1"), col("x2")))
    }
  }

  test("score applies literals left-to-right and matches a hand fold") {
    val df = Seq((2L, 3L)).toDF("x1", "x2")
    val got = df.select(Regression.score(Array(1.5, 2.0, -0.5),
      Seq(col("x1"), col("x2"))).as("s")).head().getDouble(0)
    assert(got == 1.5 + 2.0 * 2.0 + -0.5 * 3.0)
  }
}
