package graft.streaming

import graft.exec.QueryEngine
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental (streaming) exact deduplication — the continuous form
  * of the batch dedup operators (operators/Dedup.scala), and the
  * shape a 100 TB pipeline actually runs: a corpus is not deduped
  * once, it ACCRETES, and each new shard must admit only never-seen
  * documents without re-scanning everything already ingested. The
  * reference has no analogue (its closest machinery is the event-log
  * replication tail, replication.rs) — this is a pipeline extension
  * like MinHash/SimHash.
  *
  * Design: the seen-set is not stream state (a
  * `flatMapGroupsWithState` store is private to one query and
  * unreadable by the rest of the engine) but an ordinary event-sourced
  * REGISTRY TABLE keyed by the document fingerprint. That buys:
  *   - durability + time travel for free (`FOR SYSTEM_TIME` shows
  *     when any fingerprint arrived);
  *   - atomicity: admitted documents and their fingerprints land in
  *     ONE publish manifest together with the micro-batch id, so a
  *     crash replay skips whole — the registry can never drift from
  *     the table it guards (exactly-once, the StreamIngest pattern);
  *   - scale: the per-batch probe is a point probe — small batches
  *     inline their fingerprints so the bloom-indexable registry scan
  *     prunes to the probed row groups instead of collapsing the
  *     whole registry per batch.
  */
object StreamingDedup {

  /** Start deduplicated ingestion of `stream` into `table`: per
    * micro-batch, rows whose `fingerprint` already exists in
    * `registry` (or earlier in the batch — lowest table-pk wins) are
    * dropped; survivors append to `table` and their fingerprints to
    * `registry` atomically. The registry table's primary key column
    * receives the fingerprint (declare it STRING). */
  def start(
      engine: QueryEngine,
      table: String,
      registry: String,
      stream: DataFrame,
      fingerprint: Column,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(stream.isStreaming, "StreamingDedup.start needs a streaming DataFrame")
    engine.catalog.require(table)
    engine.catalog.require(registry)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        engine.ingestStreamDeduped(table, registry, batch, fingerprint,
          Some(checkpointDir), batchId)
      }
      .start()
  }

  /** Start NEAR-dup-deduplicated ingestion of `stream` into `table`:
    * per micro-batch, rows whose shingle-set Jaccard against any SEEN
    * document (earlier batches via the persistent inverted-index
    * `registry`, or earlier-pk rows of the same batch) reaches
    * `minJaccard` are dropped; survivors append to `table` and every
    * batch row's postings to `registry`, atomically with the batch id.
    * See QueryEngine.ingestStreamNearDedup for the policy and the
    * registry schema (string pk + tok/doc_id/n columns). */
  def startNearDup(
      engine: QueryEngine,
      table: String,
      registry: String,
      stream: DataFrame,
      textCol: Column,
      shingleN: Int,
      minJaccard: Double,
      checkpointDir: String,
      maxDf: Long = 10000L,
      requireOrdered: Boolean = true,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(stream.isStreaming, "StreamingDedup.startNearDup needs a streaming DataFrame")
    engine.catalog.require(table)
    engine.catalog.require(registry)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        engine.ingestStreamNearDedup(table, registry, batch, textCol,
          shingleN, minJaccard, maxDf, Some(checkpointDir), batchId,
          requireOrdered)
      }
      .start()
  }
}
