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
