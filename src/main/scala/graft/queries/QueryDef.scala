package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One verifiable operator query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle.
  * Column names and row ordering must match between the two — the
  * driver hash-compares values after sorting columns by name.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}

/** Helpers shared by the query battery.
  *
  * Float-determinism: SUMs over double "money" columns are order-
  * dependent in IEEE754, and Spark's partial aggregation visits rows in
  * a different order than DuckDB — so every money aggregate is computed
  * in exact DECIMAL and only cast to DOUBLE at the end. The fixture
  * money columns carry 2 decimals and rates carry <=2, so DECIMAL(12,2)
  * / DECIMAL(8,4) are faithful and the final doubles are bit-identical
  * across engines.
  */
object H {
  /** money column -> exact decimal */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  /** rate-like column (discount/tax) -> exact decimal */
  def dec4(c: Column): Column = c.cast(DecimalType(8, 4))
  /** exact sum of a 2-dec money column, surfaced as double */
  def dsum(c: Column): Column = sum(dec2(c)).cast("double")
  /** exact average of a 2-dec money column, surfaced as double */
  def davg(c: Column): Column =
    (sum(dec2(c)).cast("double") / count(c)).cast("double")

  /** round-to-4-then-double, the exact-output convention for decimal
    * product sums: ROUND on decimals is half-away-from-zero in both
    * Spark and DuckDB, and a scale-4 decimal -> double conversion is
    * exact (the underlying integer fits in 53 bits), unlike DuckDB's
    * lossy int128 -> double cast at scale 10. */
  implicit class RichColumn(private val c: Column) extends AnyVal {
    def r4: Column = round(c, 4).cast("double")
  }

  // Oracle-side equivalents (DuckDB SQL fragments)
  def oSum(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(12,2))) AS DOUBLE)"
  def oAvg(col: String): String =
    s"CAST(CAST(SUM(CAST($col AS DECIMAL(12,2))) AS DOUBLE) / COUNT($col) AS DOUBLE)"
}
