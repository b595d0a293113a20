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
  * replaces the document, PATCH merges into an *existing* row (a PATCH
  * on an absent key is a no-op — table_storage.rs:373-390), SOFT_DELETE
  * removes. So a key is live iff its latest INSERT is more recent than
  * its latest SOFT_DELETE, and its value is determined entirely by the
  * events from that INSERT onward (the "live epoch"): the INSERT's full
  * document plus any later PATCHes. Patches that arrive after a delete
  * but before the next insert never resurrect the row.
  *
  * Scale: both collapse variants are a single hash shuffle on pk (all
  * windows share the partitioning, so Catalyst plans one Exchange);
  * with the log bucketed by pk the shuffle disappears entirely.
  * `sequence` is monotonically increasing, so time-travel predicates
  * prune whole parquet files via min/max stats before any shuffle.
  */
object StateView {

  /** Current state: latest non-deleted payload per primary key. */
  def state(events: DataFrame): DataFrame = stateAt(events, None)

  /** Restrict an event frame to the live epoch of each pk: the events
    * from the most recent INSERT (<= the target sequence) onward, and
    * only for keys whose last INSERT outlives their last SOFT_DELETE. */
  private def liveEpoch(bounded: DataFrame): DataFrame = {
    val byPk = Window.partitionBy("pk")
    val lastIns = max(when(col("event_type") === EventLog.INSERT,
      col("sequence"))).over(byPk)
    val lastDel = max(when(col("event_type") === EventLog.SOFT_DELETE,
      col("sequence"))).over(byPk)
    bounded
      .withColumn("_li", lastIns)
      .withColumn("_ld", coalesce(lastDel, lit(Long.MinValue)))
      .where(col("_li").isNotNull && col("_li") > col("_ld") &&
        col("sequence") >= col("_li"))
  }

  /** Winning event frame per live pk as of a sequence: the single
    * event whose payload is the row's current full document. Used by
    * both `stateAt` (projects the payload) and snapshotting (rewrites
    * the frame as INSERT checkpoint rows). */
  def collapsedFrames(events: DataFrame, asOfSeq: Option[Long]): DataFrame = {
    val bounded = asOfSeq.fold(events)(s => events.where(col("sequence") <= s))
    val wDesc = Window.partitionBy("pk").orderBy(col("sequence").desc)
    liveEpoch(bounded)
      .withColumn("_rn", row_number().over(wDesc))
      .where(col("_rn") === 1)
      .select(col("sequence"), col("ts"), col("event_type"), col("pk"),
        col("payload"))
  }

  /** State as of a sequence number (inclusive). None = current. */
  def stateAt(events: DataFrame, asOfSeq: Option[Long]): DataFrame =
    collapsedFrames(events, asOfSeq).select(col("payload.*"))

  /** Resolve a timestamp to the max sequence whose event ts <= target
    * (engine.rs:2010 seq-from-ts), then reconstruct. The resolution is
    * an eager scalar action on purpose: it yields a LITERAL sequence
    * bound, so at 100 TB the main read prunes parquet files statically
    * on the sequence column instead of carrying a runtime join. Returns
    * empty state when no event precedes the timestamp. */
  def stateAsOfTimestamp(events: DataFrame, ts: Column): DataFrame = {
    val maxSeq = events
      .where(col("ts") <= ts.cast("timestamp"))
      .agg(max("sequence")).head()
    if (maxSeq.isNullAt(0)) stateAt(events.where(lit(false)), None)
    else stateAt(events, Some(maxSeq.getLong(0)))
  }

  /** Partial-patch fidelity variant (raw engine API parity —
    * table_storage.rs:364-427): per-column last non-null value over
    * ascending sequence *within the live epoch* — the fold starts at
    * the epoch's INSERT (a full document in the reference), so columns
    * from a deleted-and-reinserted row never leak across the delete,
    * and pre-insert patches stay no-ops. */
  def stateMergingPatches(events: DataFrame, payloadCols: Seq[String]): DataFrame = {
    val wAsc = Window.partitionBy("pk").orderBy("sequence")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy("pk").orderBy(col("sequence").desc)
    val merged = payloadCols.map(c =>
      last(col(s"payload.$c"), ignoreNulls = true).over(wAsc).as(c))
    liveEpoch(events)
      .select(Seq(col("pk"), col("sequence")) ++ merged: _*)
      .withColumn("_rn", row_number().over(wDesc))
      .where(col("_rn") === 1)
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
