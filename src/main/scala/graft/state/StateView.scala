package graft.state

import graft.log.EventLog
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** State reconstruction over an event log — the engine's one genuinely
  * custom operator (SURVEY §7.3).
  *
  * Reference semantics (table_storage.rs:344-428, reconstruct_state_at):
  * fold events in sequence order up to a target sequence; INSERT
  * inserts, PATCH merges into the existing row, SOFT_DELETE removes.
  * The reference's SQL layer always emits full-row patches
  * (sql_bridge.rs:5534-5537, 5637-5649), so collapse reduces to
  * "latest non-delete event per pk" — a single window + filter, which
  * Spark executes as one hash shuffle on pk with no driver-side state.
  *
  * Scale: the window ranks within pk partitions; with the log bucketed
  * by pk the shuffle is avoided entirely. `sequence` is a
  * monotonically increasing column, so time-travel predicates prune
  * whole parquet files via min/max stats before any shuffle.
  */
object StateView {

  /** Current state: latest non-deleted payload per primary key. */
  def state(events: DataFrame): DataFrame = stateAt(events, None)

  /** State as of a sequence number (inclusive). None = current. */
  def stateAt(events: DataFrame, asOfSeq: Option[Long]): DataFrame = {
    val bounded = asOfSeq.fold(events)(s => events.where(col("sequence") <= s))
    val w = Window.partitionBy("pk").orderBy(col("sequence").desc)
    bounded
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1 && col("event_type") =!= EventLog.SOFT_DELETE)
      .select(col("payload.*"))
  }

  /** Resolve a timestamp to the max sequence whose event ts <= target
    * (engine.rs:2010 seq-from-ts), then reconstruct. Returns empty
    * state when no event precedes the timestamp. */
  def stateAsOfTimestamp(events: DataFrame, ts: String): DataFrame = {
    val maxSeq = events
      .where(col("ts") <= lit(ts).cast("timestamp"))
      .agg(max("sequence")).head()
    if (maxSeq.isNullAt(0)) stateAt(events.where(lit(false)), None)
    else stateAt(events, Some(maxSeq.getLong(0)))
  }

  /** Partial-patch fidelity variant (raw engine API parity —
    * table_storage.rs:364-427): per-column last non-null value over
    * ascending sequence, still honoring a trailing SOFT_DELETE. Used
    * when PATCH events carry only changed columns (others null). */
  def stateMergingPatches(events: DataFrame, payloadCols: Seq[String]): DataFrame = {
    val wAsc = Window.partitionBy("pk").orderBy("sequence")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy("pk").orderBy(col("sequence").desc)
    val merged = payloadCols.map(c =>
      last(col(s"payload.$c"), ignoreNulls = true).over(wAsc).as(c))
    events
      .select(Seq(col("pk"), col("sequence"), col("event_type")) ++ merged: _*)
      .withColumn("_rn", row_number().over(wDesc))
      .where(col("_rn") === 1 && col("event_type") =!= EventLog.SOFT_DELETE)
      .select(payloadCols.map(col).toIndexedSeq: _*)
  }

  /** FOR SYSTEM_TIME ALL / drift history (sql_bridge.rs:6494-6556):
    * the framed event stream itself, optionally per key. */
  def history(events: DataFrame, pk: Option[Column] = None): DataFrame = {
    val base = pk.fold(events)(p => events.where(col("pk") === p.cast("string")))
    base.select(col("sequence"), col("ts"), col("event_type"), col("pk"),
      col("payload"))
  }

  /** FOR SYSTEM_TIME FROM..TO superset (parsed-but-unsupported in the
    * reference — README.md:94-96): events in a sequence range. */
  def changesBetween(events: DataFrame, fromSeq: Long, toSeq: Long): DataFrame =
    events.where(col("sequence").between(fromSeq, toSeq))
}
