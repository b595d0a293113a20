package graft.state

import graft.log.EventLog
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized state checkpoints — the analogue of the reference's
  * zstd snapshots (snapshot.rs:19-66, engine.rs:739-845) and its
  * nearest-snapshot time-travel planning (optimizer.rs:296-307,
  * table_storage.rs:350-393).
  *
  * A snapshot at sequence S is the collapsed state at S stored as
  * synthetic INSERT events (full documents, sequence = winning event's
  * sequence). A read AS OF T >= S then unions the snapshot with only
  * the events in (S, T] and collapses — replay cost is proportional to
  * the tail, not the full history. At 100 TB this is the difference
  * between scanning the whole log and scanning one checkpoint + a
  * sequence-pruned slice (parquet min/max on `sequence` skips all
  * pre-snapshot files).
  */
object Snapshots {

  /** Collapse an event log at `asOfSeq` keeping the event frame, with
    * every surviving row rewritten as a full-document INSERT. */
  def collapsedAsInserts(events: DataFrame, asOfSeq: Option[Long]): DataFrame =
    StateView.collapsedFrames(events, asOfSeq)
      .withColumn("event_type", lit(EventLog.INSERT))

  /** Write the state at `seq` to `<dir>/seq=<seq>`. `options` carries
    * write-time parquet options (e.g. modular-encryption keys). */
  def write(events: DataFrame, dir: String, seq: Long,
      options: Map[String, String] = Map.empty): Unit =
    collapsedAsInserts(events, Some(seq))
      .write.options(options).mode("overwrite").parquet(s"$dir/seq=$seq")

  /** Sequences of available snapshots (ascending). */
  def available(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("seq=") => s.stripPrefix("seq=").toLong }
      .sorted
  }

  /** Nearest snapshot at or before `target` (None = current → any). */
  def nearest(spark: SparkSession, dir: String, target: Option[Long]): Option[Long] = {
    val avail = available(spark, dir)
    target.fold(avail.lastOption)(t => avail.filter(_ <= t).lastOption)
  }

  /** Read a snapshot. With `schema` (the catalog's event schema) the
    * scan skips footer inference and absorbs ALTERs the same way the
    * log read does — absent fields are NULL. */
  def read(spark: SparkSession, dir: String, seq: Long,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame =
    schema.fold(spark.read)(s => spark.read.schema(s))
      .parquet(s"$dir/seq=$seq")
}
