package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Data-driven shuffle-partition sizing — the third scaling decade's
  * harness finding (SCALE.md) moved into the engine. At 1000× fixture
  * scale a corpus-sized exchange (the dedup shingle frame is ~1.5 B
  * rows) lands ~50 M rows per task at the 32-partition session
  * default, and 32 concurrent sort/unroll buffers of that size OOM any
  * single-host heap; the same job at thousands of partitions is
  * healthy, and OVER-sizing costs little because AQE coalesces small
  * reduce partitions before launching tasks (sort-based shuffle writes
  * one file per map task regardless of bucket count, so extra buckets
  * are an index entry, not a file). Undersizing is fatal, oversizing
  * is coalesced — so the engine sizes exchanges from the bytes it is
  * about to scan instead of trusting a static session number.
  *
  * Mechanism: raise (never lower) AQE's
  * `coalescePartitions.initialPartitionNum` so an exchange over
  * ~`bytes` of input stays under TargetBytesPerTask per reduce task.
  * Leaving `spark.sql.shuffle.partitions` itself untouched keeps
  * Structured Streaming paths (where AQE does not apply and
  * micro-batches pay real per-task overhead — the sf10 control
  * finding) at the session default. Input bytes come from the LEAF
  * scan statistics of the optimized plan — on-disk parquet bytes,
  * exact — times a caller-stated expansion factor for the explode
  * between scan and exchange; leaves with Catalyst's unknown-size
  * sentinel (pinned RDD scans) contribute zero, keeping the heuristic
  * raise-only on measured data.
  */
object ShuffleSizing {

  /** Target exchange input per reduce task — AQE's own advisory
    * partition size, so post-coalesce partitions land near it too. */
  val TargetBytesPerTask: Long = 64L << 20

  /** Ceiling on what this heuristic will ever request: 32 k tasks ×
    * 64 MB ≈ 2 TB per exchange on one host is past any local regime,
    * and on a real cluster the operator sets cluster-sized defaults. */
  val MaxPartitions: Int = 32768

  /** Leaf stats at/above this are Catalyst's unknown-size sentinel
    * (defaultSizeInBytes for un-stat'd RDD scans), not measurements. */
  private val UnknownBytes: BigInt = BigInt(1) << 50

  private val InitialKey =
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum"

  /** The partition count that keeps `inputBytes` under
    * TargetBytesPerTask per task, clamped to [floor, MaxPartitions] —
    * pure arithmetic, spec-pinned. */
  def partitionsFor(inputBytes: BigInt, floor: Int): Int =
    ((inputBytes + TargetBytesPerTask - 1) / TargetBytesPerTask)
      .min(MaxPartitions).max(math.max(1, floor)).toInt

  /** Measured on-disk bytes feeding `df`: the sum of its ANALYZED
    * plan's leaf-scan sizes, unknown-size leaves excluded. The
    * analyzed plan is already computed eagerly by spark.sql/DataFrame
    * construction, so this forces NO optimizer pass — engine paths
    * that derive a further frame from this one (DML sources) would
    * otherwise pay a wasted optimization per statement. Leaf stats
    * pre-optimization are the raw scan sizes (no pruning applied) —
    * an overestimate, which is the safe direction for a raise-only
    * heuristic whose oversize case AQE coalesces. */
  def scanBytes(df: DataFrame): BigInt =
    df.queryExecution.analyzed.collectLeaves()
      .map(_.stats.sizeInBytes).filter(_ < UnknownBytes)
      .foldLeft(BigInt(0))(_ + _)

  /** Raise-only: bump the session's AQE initial partition count so an
    * exchange over ~`exchangeBytes` fits TargetBytesPerTask per task.
    * Returns the effective initial partition count after the call. */
  def ensureFor(spark: SparkSession, exchangeBytes: BigInt): Int = {
    val sessionDefault = spark.sessionState.conf.numShufflePartitions
    val current = spark.conf.getOption(InitialKey)
      .flatMap(v => scala.util.Try(v.toInt).toOption)
      .getOrElse(sessionDefault)
    val want = partitionsFor(exchangeBytes, floor = sessionDefault)
    if (want > current) { spark.conf.set(InitialKey, want.toString); want }
    else current
  }

  /** Size for an exchange whose input is `df`'s scans expanded by
    * `expansion` (e.g. a per-token explode of document text). */
  def ensureForScan(df: DataFrame, expansion: Double): Int =
    ensureFor(df.sparkSession,
      (BigDecimal(scanBytes(df)) * expansion).toBigInt)
}
