package graft.log

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-sourced table representation (SURVEY §1.1).
  *
  * A table is an append-only log of events, mirroring the reference's
  * three event types (events.rs:5-10): INSERT (full document), PATCH
  * (partial/full update by primary key), SOFT_DELETE (tombstone). An
  * event carries (sequence, ts, event_type, pk, payload) —
  * events.rs:12-20 — with `payload` a typed struct rather than the
  * reference's JSON document.
  *
  * Scale design: the log lives in parquet partitioned by a bucket of
  * the primary key, so state collapse (StateView) shuffles at most once
  * on pk and time-travel reads prune on the `sequence` column via
  * parquet min/max statistics. Sequence assignment is a single-writer
  * concern in the reference too (process-global write lock,
  * index.rs:22-26) — here the writer assigns monotonic sequence ranges
  * per committed batch (see graft.exec.QueryEngine).
  */
object EventLog {

  /** Epoch for the deterministic logical event clock: event ts =
    * 2020-01-01T00:00:00Z + sequence seconds. The reference stamps wall
    * clock (events.rs:12-20); a sequence-derived clock keeps ts
    * monotonic with sequence (which wall clock also guarantees under
    * the reference's single writer) while making AS-OF-timestamp reads
    * reproducible. */
  val ClockEpoch: Long = 1577836800L
  val INSERT = "INSERT"
  val PATCH = "PATCH"
  val SOFT_DELETE = "SOFT_DELETE"

  /** Event-log columns that frame the payload. */
  val frameColumns: Seq[String] = Seq("sequence", "ts", "event_type", "pk")

  def schema(payload: StructType): StructType = StructType(Seq(
    StructField("sequence", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("pk", StringType, nullable = false),
    StructField("payload", payload, nullable = true)))

  /** Wrap a batch of rows as events: every row becomes one event of
    * `eventType` with the given sequence expression. `pkCol` is the
    * table's single primary-key column (schema.rs:56-79 — single-column
    * pk is mandatory in the reference). */
  def fromBatch(
      batch: DataFrame,
      pkCol: String,
      seq: org.apache.spark.sql.Column,
      ts: org.apache.spark.sql.Column,
      eventType: String): DataFrame = {
    val payload = struct(batch.columns.map(col).toIndexedSeq: _*)
    batch.select(
      seq.cast("long").as("sequence"),
      ts.cast("timestamp").as("ts"),
      lit(eventType).as("event_type"),
      col(pkCol).cast("string").as("pk"),
      payload.as("payload"))
  }

  /** Assign contiguous sequences base+1 .. base+count to a batch,
    * distributed: zipWithIndex computes per-partition offsets in one
    * extra pass instead of collapsing to a single partition (a
    * window-based row_number would). Returns the frame with a new
    * `sequence` column. The write path is driver-serialized — same
    * single-writer discipline as the reference (index.rs:22-26) — so
    * contiguity per batch is safe. */
  def assignSequences(batch: DataFrame, base: Long): DataFrame = {
    val spark = batch.sparkSession
    val out = StructType(batch.schema.fields :+
      StructField("sequence", LongType, nullable = false))
    val rdd = batch.rdd.zipWithIndex.map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (base + 1 + i))
    }
    spark.createDataFrame(rdd, out)
  }
}
