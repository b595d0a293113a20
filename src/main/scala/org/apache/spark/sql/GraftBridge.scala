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
