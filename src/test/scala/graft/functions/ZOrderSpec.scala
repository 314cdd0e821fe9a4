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

  test("zorderN matches its reference for n=3..6 and collapses to " +
    "zorder2 at n=2 bit-for-bit") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)(Seq.fill(6)(rnd.nextLong().abs))
    for (n <- 3 to 6) {
      val df = rows.map(r => Tuple1(r.take(n))).toDF("xs")
      val got = df.select(ZOrder.zorderN(
          (0 until n).map(i => element_at(col("xs"), i + 1))).as("z"))
        .as[Long].collect()
      rows.zip(got).foreach { case (r, z) =>
        assert(z == ZOrder.zorderNRef(r.take(n)), s"n=$n xs=${r.take(n)}")
      }
    }
    rows.foreach { r =>
      assert(ZOrder.zorderNRef(r.take(2)) == ZOrder.zorder2Ref(r(0), r(1)))
    }
    val df2 = rows.map(r => (r(0), r(1))).toDF("x", "y")
    val z2 = df2.select((ZOrder.zorderN(Seq(col("x"), col("y"))) ===
      ZOrder.zorder2(col("x"), col("y"))).as("eq")).as[Boolean].collect()
    assert(z2.forall(identity))
  }

  test("zorderN n=3: dropping 15 low key bits confines every dimension " +
    "to one aligned 32-wide window (the q42_zorder3_layout contract)") {
    // 16^3 grid scaled by 17 so values spread over 0..255 non-trivially
    val cells = for (x <- 0L until 16L; y <- 0L until 16L;
                     w <- 0L until 16L) yield (x * 17 % 256, y * 13 % 256,
      w * 11 % 256)
    val boxes = cells.toDF("x", "y", "w")
      .withColumn("zbucket", shiftright(ZOrder.zorderN(
        Seq(col("x"), col("y"), col("w"))), 15))
      .groupBy(col("zbucket"))
      .agg((max(col("x")) - min(col("x"))).as("sx"),
        (max(col("y")) - min(col("y"))).as("sy"),
        (max(col("w")) - min(col("w"))).as("sw"))
      .as[(Long, Long, Long, Long)].collect()
    assert(boxes.nonEmpty)
    boxes.foreach { case (b, sx, sy, sw) =>
      assert(sx <= 31 && sy <= 31 && sw <= 31,
        s"bucket $b spans sx=$sx sy=$sy sw=$sw — low 5 bits per dim " +
          "must be the only freedom inside a bucket")
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
