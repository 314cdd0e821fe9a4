package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  test("zorder2 expression matches the row-at-a-time reference, including " +
    "the low-31-bit mask on wide inputs") {
    val rnd = new scala.util.Random(7)
    val xs = Seq(0L, 1L, 2L, 0x7FFFFFFFL, 0xFFFFFFFFL, Long.MaxValue) ++
      Seq.fill(200)(rnd.nextLong().abs)
    val df = xs.zip(xs.reverse).toDF("x", "y")
    val got = df.select(ZOrder.zorder2(col("x"), col("y")).as("z"))
      .as[Long].collect()
    xs.zip(xs.reverse).zip(got).foreach { case ((x, y), z) =>
      assert(z == ZOrder.zorder2Ref(x, y), s"x=$x y=$y")
    }
  }

  test("interleave is exact on small grids: z(x,y) recovers x and y") {
    for (x <- 0 until 8; y <- 0 until 8) {
      val z = ZOrder.zorder2Ref(x, y)
      var rx = 0L; var ry = 0L
      for (b <- 0 until 31) {
        rx |= ((z >> (2 * b)) & 1L) << b
        ry |= ((z >> (2 * b + 1)) & 1L) << b
      }
      assert(rx == x && ry == y)
    }
  }

  test("range-partitioning by zkey yields per-partition bounding boxes " +
    "tight in BOTH dimensions (the layout property that prunes scans)") {
    // full 64x64 grid; one row per cell so every partition's box is exact
    val cells = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val df = cells.toDF("x", "y")
      .withColumn("z", ZOrder.zorder2(col("x"), col("y")))
    val nParts = 16
    val boxes = df.repartitionByRange(nParts, col("z"))
      .sortWithinPartitions(col("z"))
      .select(spark_partition_id().as("p"), col("x"), col("y"))
      .groupBy(col("p"))
      .agg((max(col("x")) - min(col("x")) + 1).as("dx"),
        (max(col("y")) - min(col("y")) + 1).as("dy"),
        count(lit(1)).as("n"))
      .as[(Int, Long, Long, Long)].collect()
    assert(boxes.map(_._4).sum == 64L * 64L)
    // single-column sort would give every partition dy = 64 (full span in
    // the second dimension). Z-order bounds both: a 16-way split of the
    // 12-bit z-curve covers x- and y-spans of at most 2 quadrants = 32.
    boxes.foreach { case (p, dx, dy, n) =>
      assert(dx <= 32 && dy <= 32, s"partition $p: dx=$dx dy=$dy n=$n")
    }
    // and the areas genuinely partition the grid: average box area is far
    // below the full domain (64*64), not a sliver-by-full-width slice
    val avgArea = boxes.map(b => b._2 * b._3).sum.toDouble / boxes.length
    assert(avgArea <= 1024.0, s"avg box area $avgArea")
  }
}
