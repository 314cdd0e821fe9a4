package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary` payloads
  * with typed metadata. The Spark-side plumbing (schema, batch shape,
  * partition-parallel extraction via `mapPartitions`) is real and tested.
  * IMAGE decode is REAL — `javax.imageio` (PNG/JPEG/BMP/GIF) ships in the
  * JDK, so `decodeImage` reads genuine pixels (width/height/channels plus a
  * channel checksum) with no added dependency. Audio/video decode remains a
  * clearly-marked deterministic STUB (no codec library in this container) —
  * swap it for javacv / a Python `mapInPandas` stage in production.
  */
object Multimodal {

  // ImageIO's stream cache defaults to FILE-backed: every read/write
  // materializes (and deletes) a temp file — pure syscall overhead when
  // the payload is already an in-memory byte array, and a per-image tax
  // a 100 TB crawl pays millions of times per executor. Memory caching
  // decodes the identical pixels. Runs once per JVM at object init; the
  // executors initialize this object the first time any media closure
  // runs, so the switch reaches every task JVM without cluster conf.
  javax.imageio.ImageIO.setUseCache(false)

  final case class MediaRecord(id: Long, mediaType: String,
                               payload: Array[Byte])
  final case class MediaFeatures(id: Long, mediaType: String, nBytes: Long,
                                 fingerprint: String, width: Int, height: Int,
                                 durationMs: Long)
  final case class Frame(id: Long, frameIndex: Int, frameBytes: Array[Byte])

  /** STUB decode: derives deterministic pseudo-metadata from the payload
    * bytes (md5 fingerprint, dims/duration from the hash). Replace with a
    * real codec; the signature — bytes in, typed features out, executed
    * batch-wise per partition — is the production shape. */
  private[analytics] def decodeStub(r: MediaRecord): MediaFeatures = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(r.payload)
    val hex = digest.map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 8), 16)
    MediaFeatures(r.id, r.mediaType, r.payload.length.toLong, hex,
      width = (h % 1920).toInt + 1, height = (h % 1080).toInt + 1,
      durationMs = h % 600000)
  }

  /** Feature extraction over a media Dataset: partition-parallel, batch-wise
    * (the decoder amortizes any per-batch init — model load, codec context —
    * across the partition's rows, the same shape `mapInPandas` gives a
    * Python decoder). */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it => it.map(decodeStub) }
  }

  final case class ImageFeatures(id: Long, width: Int, height: Int,
                                 channels: Int, redSum: Long)

  /** REAL image decode via the JDK's `javax.imageio` — genuine pixels, not
    * the stub: dimensions and channel count come from the decoded raster,
    * and `redSum` (Σ of the red channel over every pixel) proves the pixel
    * DATA round-tripped, not just the header. Throws on an undecodable
    * payload — silent nulls would let a corrupt-media regression pass as
    * an empty result. */
  private[graft] def decodeImage(r: MediaRecord): ImageFeatures = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.payload))
    require(img != null, s"undecodable image payload for id=${r.id}")
    var s = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        s += (img.getRGB(x, y) >> 16) & 0xFF
        x += 1
      }
      y += 1
    }
    ImageFeatures(r.id, img.getWidth, img.getHeight,
      img.getColorModel.getNumComponents, s)
  }

  /** Image feature extraction: same partition-parallel batch shape as
    * `extractFeatures`, but over the real `javax.imageio` decoder. At
    * 100 TB each task decodes its partition's payloads independently —
    * no shuffle, no driver involvement; codec init is amortized by the
    * JVM-wide ImageIO registry. */
  def extractImageFeatures(ds: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it => it.map(decodeImage) }
  }

  final case class ImageDHash(id: Long, width: Int, height: Int, dhash: Long)

  /** 56-bit difference hash (dHash — the classic perceptual image hash)
    * over the REAL decoded red channel: point-sample an 8-row × 8-column
    * grid at the exact integer coordinates `sx(c) = c·w / 8`,
    * `sy(r) = r·h / 8` (floor division), and set bit `r·7 + c` iff
    * `sample(c+1, r) > sample(c, r)` — 7 comparisons × 8 rows = 56 bits,
    * deliberately one byte short of 64 so the hash stays a positive
    * int64 in every engine that replays it. Near-duplicate images (same
    * gradient structure at any resolution) land in the same bucket —
    * the perceptual twin of `Dedup.exact`'s md5 bucket, and the
    * image-side dedup a training pipeline runs before pixel-level
    * compare. Point sampling (not area averaging) keeps the hash a
    * closed form a SQL oracle recomputes from the fixture generator
    * without a decoder. Decode is per-partition like
    * [[extractImageFeatures]] — no shuffle until the bucket groupBy. */
  def dHash56(ds: Dataset[MediaRecord]): Dataset[ImageDHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        val one = dHash56OfBytes(rec.id, rec.payload)
        require(one != null, s"undecodable image payload for id=${rec.id}")
        one
      }
    }
  }

  /** REAL image resize — decode, nearest-neighbor resample at the exact
    * integer coordinate map `src = dst·srcDim / dstDim` (floor), PNG
    * re-encode — replacing the byte-subsample stub for the image
    * mediaType (audio/video keep the stub: no codec lib ships here).
    * Deterministic integer sampling plus PNG's losslessness keep every
    * resized pixel a closed form a SQL oracle replays; the thumbnail /
    * training-resolution normalization step of an image pipeline.
    * Map-only per partition like every media op; output payloads are
    * real PNGs that feed straight back into [[extractImageFeatures]] /
    * [[dHash56]]. */
  def resizeImages(ds: Dataset[MediaRecord], targetW: Int,
                   targetH: Int): Dataset[MediaRecord] = {
    require(targetW > 0 && targetH > 0)
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { rec =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(rec.payload))
        require(img != null, s"undecodable image payload for id=${rec.id}")
        val out = new java.awt.image.BufferedImage(targetW, targetH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < targetH) {
          val sy = y * img.getHeight / targetH
          var x = 0
          while (x < targetW) {
            out.setRGB(x, y, img.getRGB(x * img.getWidth / targetW, sy))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        MediaRecord(rec.id, "image/png", bos.toByteArray)
      }
    }
  }

  /** [[dHash56]] with crawl-tolerant failure semantics: undecodable
    * payloads are SKIPPED instead of thrown — the variant a streaming
    * gate needs, where one corrupt PNG in a micro-batch must not wedge
    * the checkpoint in a replay loop (the batch operator keeps the loud
    * contract: silently dropping rows from a REPORT would hide a
    * corrupt-media regression, but a dedup GATE passing an undecodable
    * row through to downstream quality/DLQ handling is the correct
    * lenient behavior). */
  def dHash56Lenient(ds: Dataset[MediaRecord]): Dataset[ImageDHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { rec =>
        try {
          val one = dHash56OfBytes(rec.id, rec.payload)
          if (one == null) None else Some(one)
        } catch { case _: Exception => None }
      }
    }
  }

  private def dHash56OfBytes(id: Long, payload: Array[Byte]): ImageDHash = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    def red(x: Int, y: Int): Int = (img.getRGB(x, y) >> 16) & 0xFF
    var hash = 0L
    var r = 0
    while (r < 8) {
      val y = r * h / 8
      var c = 0
      while (c < 7) {
        val x0 = c * w / 8
        val x1 = (c + 1) * w / 8
        if (red(x1, y) > red(x0, y)) hash |= 1L << (r * 7 + c)
        c += 1
      }
      r += 1
    }
    ImageDHash(id, w, h, hash)
  }

  /** Deterministic RGB PNG fixture encoder (executor-side): a width×height
    * image whose red channel is `(id + x + y) % 256` — a closed form a SQL
    * oracle replays without any decoder — and green/blue carry id-derived
    * patterns so the bytes aren't degenerate. Encode→decode through real
    * PNG bytes is what makes `decodeImage`'s output a genuine decode
    * check: garbage pixels would break the red-sum equality. */
  private[graft] def encodePng(id: Long, width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0)
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = ((id + x + y) % 256).toInt
        val g = ((id * 3 + x) % 256).toInt
        val b = ((id * 5 + y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Frame sampling STUB for video payloads: emits every `stride`-th slice
    * of the payload as a pseudo-frame. Real implementation replaces the
    * slicing with codec frame extraction; the explode-shaped output (one row
    * per frame, partitioned by media id) is the production schema. */
  def sampleFrames(ds: Dataset[MediaRecord], stride: Int): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      val n = math.max(1, r.payload.length / math.max(1, stride))
      (0 until math.min(n, 8)).map { i =>
        val from = i * stride
        val until = math.min(r.payload.length, from + stride)
        Frame(r.id, i, java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }
  }

  final case class Resized(id: Long, targetW: Int, targetH: Int,
                           nBytesIn: Long, nBytesOut: Long,
                           resizedFp: String)

  /** Resize STUB: "scales" each payload to the target dimensions by
    * deterministic byte subsampling (payload stride = in/out byte ratio)
    * — the real implementation swaps the sampler for a codec resize; the
    * signature (payload + target dims in, resized payload metadata out,
    * batch-wise per partition so a real decoder amortizes init) and the
    * output schema are the production shape. Output size model:
    * out = ceil(in · (targetW·targetH) / (1920·1080)) bytes, capped at
    * the input. */
  def resize(ds: Dataset[MediaRecord], targetW: Int,
             targetH: Int): Dataset[Resized] = {
    import ds.sparkSession.implicits._
    require(targetW > 0 && targetH > 0)
    ds.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val in = r.payload.length.toLong
        val outLen = math.max(1L, math.min(in,
          (in * targetW.toLong * targetH + 1920L * 1080 - 1) /
            (1920L * 1080))).toInt
        val out = new Array[Byte](if (in == 0) 0 else outLen)
        var i = 0
        while (i < out.length) { // stride-subsample the payload
          out(i) = r.payload(((i.toLong * in) / out.length).toInt)
          i += 1
        }
        md.reset()
        val fp = md.digest(out).map("%02x".format(_)).mkString
        Resized(r.id, targetW, targetH, in, out.length.toLong, fp)
      }
    }
  }

  /** Wrap any DataFrame with a binary column into the media schema. */
  def asMedia(df: DataFrame, id: String, payload: String,
              mediaType: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(col(id).cast("long").as("id"),
        lit(mediaType).as("mediaType"),
        col(payload).cast("binary").as("payload"))
      .as[MediaRecord]
  }
}
