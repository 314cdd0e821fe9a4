package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}

/** W8/X4 zombie-writer fencing — the runtime analogue of the reference's
  * conditional writes (`storage/S3OutputStream.java:363-390`: If-None-Match
  * on complete-MPU) and zombie file scan
  * (`TopicPartitionWriter.java:1011-1053`).
  *
  * Deterministic object names already make replays byte-identical, so a
  * zombie writing the SAME config/data is harmless (X1). What names cannot
  * defend against is a *stale* writer — an old driver instance with an
  * outdated config still running after a new instance took over, writing
  * correct-looking objects from obsolete state. The reference fences that
  * with conditional S3 writes; here each writer generation claims a
  * monotonically increasing epoch with an ATOMIC marker create
  * (`FileSystem.create(..., overwrite=false)` — rejected if the marker
  * exists, the same compare-and-set class as If-None-Match), and the
  * committed-files path re-verifies the claim at the commit point: a
  * writer holding epoch n aborts as soon as some epoch > n exists.
  *
  * The check is claim-then-verify, not a distributed transaction — a
  * zombie can pass the verify and rename a file in the gap, which is the
  * same window the reference's per-file conditional write leaves between
  * files of one commit batch. Both guarantee a zombie cannot keep
  * committing once superseded.
  */
final class EpochFence(baseDir: String,
                       hadoopConf: org.apache.hadoop.conf.Configuration) {

  private val dir = new Path(baseDir, "_graft_epoch")
  private def fs: FileSystem = dir.getFileSystem(hadoopConf)

  /** Claim the next epoch atomically; returns the claimed epoch number.
    * Races lose the atomic create and retry against the new latest. */
  def acquire(): Long = {
    val f = fs
    f.mkdirs(dir)
    var claimed = -1L
    var attempts = 0
    while (claimed < 0) {
      attempts += 1
      require(attempts <= 100, "epoch claim retry storm — check the store")
      val next = latest(f) + 1
      try {
        f.create(new Path(dir, s"epoch-$next"), false).close() // atomic CAS
        claimed = next
      } catch { case _: java.io.IOException => () } // lost the race; retry
    }
    claimed
  }

  /** The highest claimed epoch (0 when none). */
  def latestEpoch: Long = latest(fs)

  /** Verify `epoch` is still the newest claim; throws if a newer writer
    * generation exists — the caller must abort its commit. */
  def check(epoch: Long): Unit = {
    val l = latest(fs)
    if (l > epoch) throw new IllegalStateException(
      s"zombie writer fenced: holding epoch $epoch but epoch $l exists")
  }

  private def latest(f: FileSystem): Long =
    if (!f.exists(dir)) 0L
    else f.listStatus(dir).iterator.map(_.getPath.getName)
      .collect { case n if n.startsWith("epoch-") =>
        n.stripPrefix("epoch-").toLong }
      .foldLeft(0L)(math.max)
}
