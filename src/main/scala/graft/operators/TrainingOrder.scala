package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-order shuffle + shard assignment — the last
  * stage of a pretraining pipeline (pipeline extension; the reference
  * has no export ordering surface). Training wants the corpus in a
  * pseudo-random order that is REPRODUCIBLE: re-running the export for
  * the same seed must yield byte-identical shards, or a resumed run
  * trains on a different data order than its checkpoint assumed.
  *
  * The order key is the same engine-portable multiplicative hash the
  * sampling operators use, scattered through a prime modulus:
  * `(key * 2654435761 + seed) % 1000000007` — exact BIGINT arithmetic
  * (no float, no engine-specific hash), near-bijective for keys below
  * the prime, ties broken by the key itself. A different seed is a
  * different permutation; the same seed is always the same one.
  *
  * 100 TB shape: shard = hash % numShards is a pure scan-stage
  * expression; the one shuffle is the repartition onto shards, and the
  * per-shard ORDER is a sort within each shard's partition — there is
  * NO global sort. Shards are the parallel unit a training loader
  * reads, so `numShards` is sized to the loader (thousands), which
  * also keeps every sort partition-local and spill-free.
  */
object TrainingOrder {

  /** The deterministic order key: `(key·2654435761 + seed) mod p`,
    * p = 1e9+7 (prime, so the multiplicative scatter cycles through
    * the whole residue ring). Exact for keys < 3.4e9 — same bound as
    * `Sampling.pctBucket`; its virtue is being re-derivable in ANSI
    * SQL (the oracle recomputes it), which is why the oracle-checked
    * paths keep it. Corpora whose id domain exceeds ~2^31.5 use
    * [[orderKey64]] instead. */
  def orderKey(key: Column, seed: Long): Column =
    pmod(key.cast("long") * lit(2654435761L) + lit(seed), lit(1000000007L))

  /** 64-bit order key for id domains past the closed-form bound:
    * xxhash64(key, seed) — exact at ANY BIGINT id (no overflow, the
    * multiply above would wrap past ~3.4e9 and DuckDB would refuse
    * the same arithmetic), still deterministic per (key, seed).
    * Tradeoff: xxhash64 is not re-derivable in ANSI SQL, so results
    * verify by permutation-quality properties (CurationSpec), not a
    * SQL oracle. */
  def orderKey64(key: Column, seed: Long): Column =
    xxhash64(key.cast("long"), lit(seed))

  /** Assign each row its shard and in-shard position for a seeded
    * training order: (`shard` in [0, numShards), `pos` = 1-based rank
    * inside the shard by (orderKey, key)). The returned frame is the
    * EXPORT PLAN — writers repartition on `shard` and sort within
    * partitions by `pos`, giving one sorted file per shard with no
    * global sort anywhere. `wide = true` forces the 64-bit key; with
    * `wide = false` the key domain is probed (one column-pruned
    * min/max, KeyDomain.needsWide) and ids past the closed-form bound
    * auto-switch to it rather than silently wrapping. */
  def shardPlan(df: DataFrame, key: Column, seed: Long,
      numShards: Int, wide: Boolean = false): DataFrame = {
    val useWide =
      wide || KeyDomain.needsWide(df, key, "TrainingOrder.shardPlan")
    val ord = if (useWide) orderKey64(key, seed) else orderKey(key, seed)
    val w = Window.partitionBy(col("_shard")).orderBy(col("_ord"), key)
    df.withColumn("_ord", ord)
      .withColumn("_shard", pmod(col("_ord"), lit(numShards.toLong)))
      .withColumn("pos", row_number().over(w))
      .withColumnRenamed("_shard", "shard")
      .drop("_ord")
  }

  /** Write the seeded order as one sorted parquet file per shard —
    * the exact layout a data loader consumes. Repartitioning on the
    * shard column puts each shard in exactly one task; the in-task
    * sort is the only ordering work. */
  def writeShards(df: DataFrame, key: Column, seed: Long, numShards: Int,
      path: String, wide: Boolean = false): Unit =
    shardPlan(df, key, seed, numShards, wide)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
}
