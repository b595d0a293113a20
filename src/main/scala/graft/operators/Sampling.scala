package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Random samples
  * are unreproducible across runs and engines; these use arithmetic
  * key hashing so the same corpus always yields the same sample — the
  * property a 100 TB pipeline needs for resumable, auditable runs
  * (and what makes the operators oracle-checkable at all).
  *
  * The hash is Knuth's multiplicative scheme over the numeric key:
  * `(key * 2654435761) % 100` — odd multiplier, so low decimal digits
  * mix; exact in BIGINT for keys < 3.4e9; expressible identically in
  * any SQL engine. Not cryptographic — keys correlated with content
  * quality should be bucketed by a real digest instead (md5 is
  * available on both engines at ~4× the cost).
  */
object Sampling {

  /** `(key * 2654435761) % 100` as a column — the per-row sampling
    * bucket in [0, 100). */
  def pctBucket(key: Column): Column =
    pmod(key.cast("long") * lit(2654435761L), lit(100L))

  /** Rate-based stratified sample: keep a row when its bucket falls
    * under its stratum's percentage. A pure filter — no shuffle, no
    * state, evaluated inside the scan stage; the only 100 TB cost is
    * the read itself. */
  def stratified(df: DataFrame, key: Column, stratum: Column,
      pctByStratum: Map[String, Int], defaultPct: Int): DataFrame = {
    val threshold = pctByStratum.foldLeft(lit(defaultPct)) {
      case (acc, (s, p)) => when(stratum === lit(s), lit(p)).otherwise(acc)
    }
    df.where(pctBucket(key) < threshold)
  }

  /** Exactly-k-per-stratum sample: rank rows inside each stratum by
    * (bucket, key) and keep the first k. One shuffle on the stratum
    * column; WindowGroupLimit prunes each partition to k rows before
    * the sort, so the shuffled volume is O(k · strata), not the
    * corpus. */
  def exactK(df: DataFrame, key: Column, stratum: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(pctBucket(key), key)
    df.withColumn("_rk", row_number().over(w)).where(col("_rk") <= k).drop("_rk")
  }
}
