package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> catalyst Expression bridge for graft's custom
  * expressions. Spark 4 split `Column` from catalyst (Spark Connect),
  * making the direct constructors `private[sql]`; custom native
  * expressions (the extension tier below a full LogicalPlan/Strategy)
  * still need to enter the Column algebra somewhere, and this is the
  * same doorway other Spark-native libraries use. Only these two
  * one-line delegations live inside the spark namespace. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Pin-and-count: materialize `df`'s physical RDD into persisted
    * blocks and return (pinned frame, per-partition row counts, the
    * pinned RDD for later release) — ONE job where a
    * localCheckpoint-then-count pair pays two, and at the InternalRow
    * layer so every downstream consumer (guard probes, sequence
    * assignment, the staging write) reads the blocks without Row
    * boxing. Mirrors Dataset.localCheckpoint's own internals
    * (execute → copy → persist → LogicalRDD.fromDataset); the count
    * pass is the forcing action localCheckpoint(eager) would have
    * spent on a plain count. */
  def pinCounted(df: DataFrame): (DataFrame, Array[Long], org.apache.spark.rdd.RDD[_]) = {
    val cds = df.asInstanceOf[classic.Dataset[Row]]
    val rdd = cds.queryExecution.toRdd.map(_.copy())
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = rdd
      .mapPartitions(it => Iterator.single(it.size.toLong),
        preservesPartitioning = true)
      .collect()
    val plan = execution.LogicalRDD.fromDataset(rdd, cds, isStreaming = false)
    (classic.Dataset.ofRows(cds.sparkSession, plan), counts, rdd)
  }

  /** Register a SQL function on an ALREADY-RUNNING session (notebooks,
    * tests). `spark.sql.extensions` is a static conf applied only at
    * session construction; this is the runtime path to the same
    * registry. */
  def registerFunction(spark: SparkSession, name: String,
      usage: String,
      builder: Seq[Expression] => Expression): Unit = {
    val info = new catalyst.expressions.ExpressionInfo(
      "graft.GraftExtensions", null, name, usage, "")
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(catalyst.FunctionIdentifier(name), info, builder)
  }
}
