package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic release of `localCheckpoint` block pins.
  *
  * A `localCheckpoint` stores its partitions in executor block storage
  * and Spark's ContextCleaner only frees them after a DRIVER GC
  * collects the RDD object — which a large-heap driver may not run for
  * hundreds of queries. Over a long suite the stranded pins saturate
  * the block manager and unrelated queries pay eviction + GC (bench
  * r9: heavy queries inflated 4-18x over their solo cost). These
  * helpers free pins the moment their data is provably dead instead of
  * waiting for a GC that may never come.
  *
  * Safety rule: a localCheckpoint truncates lineage, so an unpersisted
  * checkpoint RDD CANNOT be recomputed — only free a pin once nothing
  * will scan it again (e.g. the next iteration's pin has materialized,
  * or the result has been collected).
  */
object Pins {

  /** Unpersist every checkpoint RDD among `df`'s plan leaves
    * (blocking = false). No-op for plans without checkpointed leaves;
    * idempotent — a second free of the same pin does nothing. */
  def free(df: DataFrame): Unit =
    df.queryExecution.logical.collectLeaves().foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        scala.util.Try(r.rdd.unpersist(blocking = false))
      case _ => ()
    }

  /** Unpersist EVERY persistent RDD in the session — the between-
    * queries sweep for harnesses (Bench, Verify) whose queries are
    * independent: after a query's result is consumed, nothing it
    * pinned or cached can be referenced again. */
  def sweep(spark: SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.values
      .foreach(r => scala.util.Try(r.unpersist(blocking = false)))
}
