package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-domain width detection for the closed-form multiplicative
  * hashes (`TrainingOrder.orderKey`, `Mixture.permilleBucket`).
  *
  * The closed form `key * 2654435761 % m` is exact BIGINT arithmetic —
  * and ANSI-SQL re-derivable, which is why the oracle-checked paths
  * use it — only while `|key| * 2654435761` fits a signed 64-bit
  * integer, i.e. |key| <= ~3.47e9. A corpus whose id domain silently
  * crosses that bound would get WRAPPED order keys: still
  * deterministic, but no longer the documented permutation and no
  * longer SQL-re-derivable, the worst kind of quiet corruption for a
  * resumable training export.
  *
  * `needsWide` detects the crossing at plan time with ONE
  * column-pruned min/max aggregation over the key column (map-side
  * partial agg; the only corpus pass, and the narrowest possible one)
  * so callers auto-switch to the xxhash64 wide keys instead of
  * wrapping. Callers that KNOW their domain pass `wide = true` and
  * skip the probe.
  */
object KeyDomain {

  /** Largest |key| for which `key * 2654435761 + seed` cannot overflow
    * a signed 64-bit integer for any |seed| <= 2^32 — a safety margin
    * under Long.MaxValue / 2654435761 = 3.474e9. */
  val ClosedFormMaxKey: Long = 3400000000L

  /** ONE column-pruned min/max over the key: true iff some id lies
    * outside the closed form's exact range. Null keys don't decide
    * (they hash to null either way). */
  private[operators] def needsWide(df: DataFrame, key: Column,
      where: String): Boolean = {
    val r = df.agg(min(key.cast("long")).as("lo"),
      max(key.cast("long")).as("hi")).head()
    val wide = !r.isNullAt(1) && (r.getLong(1) > ClosedFormMaxKey ||
      r.getLong(0) < -ClosedFormMaxKey)
    if (wide) System.err.println(
      s"[graft] $where: key domain [${r.getLong(0)}, ${r.getLong(1)}] " +
        s"exceeds the closed-form hash's exact range (|key| <= " +
        s"$ClosedFormMaxKey) — switching to the 64-bit xxhash64 key")
    wide
  }
}
