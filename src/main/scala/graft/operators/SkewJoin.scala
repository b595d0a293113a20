package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for heavy-hitter keys — the manual escape hatch
  * when one join key holds a disproportionate share of the fact side
  * (AQE's skew-join split handles moderate skew by splitting oversized
  * PARTITIONS, but a single key that alone exceeds a partition cannot
  * be split by partition boundaries: every row of that key still hashes
  * to one reducer; salting is the standard fix, cf. the Spark
  * performance literature).
  *
  * Construction: the fact side gets a deterministic salt in [0, S)
  * derived from the full row content (same-key rows spread across S
  * sub-keys; no RNG, so plans replay identically); the dim side is
  * replicated S ways with every salt value. The join key becomes
  * (key, salt): the hot key's rows now land on S reducers instead of
  * one. Cost: dim side scanned/shuffled S× — use for genuinely hot
  * keys with a small-to-medium dim side, S sized to the skew ratio.
  *
  * Result is EXACTLY the plain inner/left join (each fact row matches
  * the one dim replica carrying its salt) — which is also how the
  * oracle checks it.
  */
object SkewJoin {

  /** Inner (or left) equi-join of `fact` and `dim` on `key`, salted
    * `salts` ways. Column sets must be disjoint apart from `key`. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int = 8, joinType: String = "inner"): DataFrame = {
    require(salts >= 1 && salts <= 4096, s"salts must be in [1, 4096], got $salts")
    val saltCol: Column =
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(salts))
    val factS = fact.withColumn("__salt", saltCol)
    val dimS = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    factS.join(dimS, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
