package graft.log

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
