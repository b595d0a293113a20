package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the payload of the most recent
  * right row with the same key and right.time <= left.time (inclusive).
  *
  * The reference has no as-of operator ([REF-GAP] — SURVEY §2.3 lists
  * range/as-of/interval joins absent); this is a pipeline extension in
  * the spirit of its temporal reads. Spark also lacks a native as-of
  * join, and the naive formulations break at scale: a correlated
  * subquery re-scans the right side per left row, and an inequality
  * join (`l.key = r.key AND r.ts <= l.ts` + argmax) explodes to every
  * historical pair before aggregating — O(|L|·|R|) per key.
  *
  * The scalable shape is union-tag + running last:
  *   1. tag right rows side=0 carrying their payload as a struct, left
  *      rows side=1 with a NULL payload;
  *   2. one shuffle: window over key ordered by (time, side, tiebreak)
  *      with a running `last(payload, ignoreNulls)` — each row sees the
  *      newest right payload at-or-before itself (right sorts before
  *      left at equal time, making the join inclusive);
  *   3. keep side=1 rows.
  * One shuffle of |L|+|R| rows, no pair explosion, partial-agg-free;
  * skewed keys cost what any windowed read of that key costs.
  */
object AsOfJoin {

  /** @param keys      equality columns present in both frames
    * @param leftTime  left event-time column name
    * @param rightTime right event-time column name
    * @param payload   right columns to attach (prefixed `asof_`)
    * @param tieBreak  right column breaking equal-time ties (greatest
    *                  wins); None = ties resolve arbitrarily */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      tieBreak: Option[String] = None, prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val tb: Column = tieBreak.fold(lit(0L))(c => col(c).cast("long"))
    val rTagged = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("_asof_t"),
        lit(0).as("_asof_side"),
        tb.as("_asof_tb"),
        struct(payload.map(col): _*).as("_asof_p")): _*)
    val lTagged = left.select(
      left.columns.map(col).toSeq ++ Seq(
        col(leftTime).as("_asof_t"),
        lit(1).as("_asof_side"),
        lit(Long.MaxValue).as("_asof_tb")): _*)
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_t"), col("_asof_side"), col("_asof_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_asof_m", last(col("_asof_p"), ignoreNulls = true).over(w))
      .where(col("_asof_side") === 1)
      .select(left.columns.map(col).toSeq ++
        payload.map(p => col(s"_asof_m.$p").as(s"$prefix$p")): _*)
  }
}
