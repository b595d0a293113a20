package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed token-budget packs for
  * LLM training batches. The assignment is prefix-sum packing in key
  * order within a shard: pack_id = floor(tokens_before_this_doc /
  * budget), where tokens_before is the running token count of all
  * earlier docs in the shard. Deterministic, one window over each
  * shard, and a boundary document simply spills its pack past the
  * budget (the standard greedy caveat; true first-fit needs a
  * sequential scan and buys back only the boundary slack).
  *
  * Scale design: the running sum is windowed PER SHARD (source, date,
  * or any partition key), so packing parallelizes across shards and
  * never needs a global order — a global cumulative sum would funnel
  * 100 TB through one task. Shards should be sized like write
  * partitions (100s of MB to GB); packs never cross a shard, which is
  * what a training-data layout wants anyway (shard = shuffle unit).
  */
object Packing {

  /** Per-document pack assignment: (shard, key, n_tokens, pack_id).
    * Tokenization is whitespace, like TextAnalysis.tokenCount. */
  def assign(docs: DataFrame, key: Column, textCol: Column, shard: Column,
      budget: Int): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("key")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(shard.as("shard"), key.as("key"),
        size(split(textCol, " ")).cast("long").as("n_tokens"))
      .withColumn("before", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("pack_id",
        floor(col("before") / lit(budget.toDouble)).cast("long"))
      .drop("before")
  }

  /** Pack-level summary: documents and tokens per (shard, pack). */
  def packs(docs: DataFrame, key: Column, textCol: Column, shard: Column,
      budget: Int): DataFrame =
    assign(docs, key, textCol, shard, budget)
      .groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))
      .orderBy(col("shard"), col("pack_id"))
}
