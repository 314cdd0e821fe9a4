package graft.analytics

import org.apache.spark.sql.DataFrame

/** Scale-adaptive partitioning for ITERATIVE operators (guide §2:
  * "make partitioning scale-adaptive — derive from input size — rather
  * than a constant tuned for either local mode or the cluster").
  *
  * The iterative loops (PageRank/PPR/label-prop/k-core, alternating-star
  * clustering, NSW search) re-shuffle a small state frame every round on
  * a pinned key. Two partition-count regimes are both wrong for them:
  *
  *  - `spark.sql.shuffle.partitions` (= core count in the bench) puts
  *    32 near-empty tasks in EVERY round's every stage; at sf0.1 the
  *    measured per-task overhead (scheduling + broadcast/cache lock
  *    contention + GC of 32 concurrent no-op tasks) made graph_pagerank
  *    2.4x SLOWER on 32 cores than on 4 — inverse scaling the driver's
  *    low-core bench run would otherwise record as fact.
  *  - AQE coalescing cannot help: the loop's joins must stay
  *    co-partitioned with CACHED frames round over round, and AQE
  *    neither re-partitions InMemoryRelations nor preserves the pinning
  *    across `localCheckpoint` boundaries (measured: coalescing the
  *    round aggregates to 1 partition while the cached edge frame kept
  *    32 forced a re-exchange of the edge side every round).
  *
  * So loops derive ONE partition count from the INPUT's optimizer size
  * estimate — bytes / `spark.graft.loop.partition.bytes` (default 64 MB,
  * the AQE advisory default; set 128–256 MB on a production cluster —
  * guide §2.2's 100 MB–1 GB range) — and pin every loop-state exchange
  * and cached frame to it. At sf0.1 that is 1 partition (the data IS one
  * task's worth); at 100 TB an edge frame estimates to O(bytes/64 MB)
  * partitions, exactly the sizing §2.2 prescribes. Unusable estimates
  * (missing stats, the Long.MaxValue "unknown" default of bare
  * LogicalRDDs) fall back to `spark.sql.shuffle.partitions` — the
  * pre-round-16 behavior. */
object Tuning {

  /** Bytes of loop state per partition; production clusters raise it. */
  val LoopBytesConf = "spark.graft.loop.partition.bytes"

  /** Size-derived partition count for a loop keyed on `df`'s volume:
    * ceil(sizeInBytes / loop.partition.bytes) clamped to [1, 2^20],
    * falling back to `spark.sql.shuffle.partitions` when the estimate
    * is absent or the planner's "unknown" sentinel. */
  def loopPartitions(df: DataFrame): Int = {
    val conf = df.sparkSession.conf
    val fallback = conf.get("spark.sql.shuffle.partitions", "200").toInt
    val target = conf.get(LoopBytesConf, (64L << 20).toString).toLong
    val sz =
      try df.queryExecution.optimizedPlan.stats.sizeInBytes
      catch { case _: Throwable => BigInt(-1) }
    // ceiling cores×64 (r16 advice): the estimate is an OPTIMIZER guess —
    // on derived inputs (join products below the unknown sentinel) it can
    // inflate by orders of magnitude, and an unclamped p pins a ~1M-task
    // exchange into EVERY round. cores×64 waves of `target`-sized
    // partitions (= cores×4 GB of loop state at the 64 MB default) is
    // the sane band; genuinely larger loop state gets proportionally
    // larger partitions, which §2.2 prefers anyway.
    val ceiling = BigInt(df.sparkSession.sparkContext.defaultParallelism)
      .max(1) * 64
    if (sz <= 0 || sz >= BigInt(Long.MaxValue) / 4 || target <= 0) fallback
    // floor 2, not 1: repartition(1, key) plans as SinglePartition,
    // which ERASES the hash-key information — the per-round joins then
    // cannot prove co-partitioning and re-exchange the pinned frame
    // (observed in the round-plan dump); at 2 the HashPartitioning
    // survives and the pinning does its job at every scale
    else ((sz + target - 1) / target).max(2)
      .min(ceiling).min(BigInt(1 << 20)).toInt
  }

  /** Parallelism floor for CPU-HEAVY per-row projections (the inverse of
    * `loopPartitions`): tokenize/shingle-hash/fold expressions evaluate
    * where they are written — usually fused into the scan stage — and a
    * small input (one parquet row group) scans as ONE task no matter how
    * expensive the per-row work is (measured at sf0.1: the
    * pipeline_tokenizer_prep gram-hash stages ran 3.5 s single-task on a
    * 32-core session, 31 cores idle). When the input's size estimate says
    * the scan opens fewer splits than the session's cores
    * (bytes < defaultParallelism × files.maxPartitionBytes), round-robin
    * repartition to the core count so the heavy projection lands after
    * the exchange at full parallelism; the exchanged bytes are by
    * construction under one scan split per core. At production scale the
    * condition is false (bytes/128 MB ≫ cores) and this is an identity —
    * no shuffle is ever added to a large scan. Unknown estimates skip
    * the boost (identity), the pre-round-16 behavior. */
  def boostMapParallelism(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    val maxSplit =
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
      catch { case _: Throwable => 128L << 20 }
    val sz =
      try df.queryExecution.optimizedPlan.stats.sizeInBytes
      catch { case _: Throwable => BigInt(-1) }
    if (sz > 0 && sz < BigInt(Long.MaxValue) / 4 &&
        sz < BigInt(cores) * maxSplit && cores > 1)
      df.repartition(cores)
    else df
  }

  /** Same sizing from a MATERIALIZED row count (for loops whose input is
    * a derived plan — intersects, candidate generators — where the
    * optimizer's estimate degenerates to the unknown sentinel but the
    * loop has already persisted/checkpointed its base, making an exact
    * count one cheap action over data round 1 materializes anyway). */
  def loopPartitionsForRows(spark: org.apache.spark.sql.SparkSession,
                            rows: Long, bytesPerRow: Long): Int = {
    val target = spark.conf.get(LoopBytesConf, (64L << 20).toString).toLong
    if (target <= 0) spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    else ((rows.max(0L) * bytesPerRow + target - 1) / target)
      .max(2L).min(1L << 20).toInt // floor 2 — see loopPartitions
  }
}
