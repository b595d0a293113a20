package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.FrequentItems

/** Heavy-hitters over a token/item stream: Misra–Gries frequent-items
  * summaries (bounded memory, map-side combined — see
  * [[graft.functions.FrequentItems]]) plus the deterministic
  * "guaranteed hot" report that makes the sketch oracle-checkable.
  *
  * Scale shape: `frequentItems` is ONE aggregation whose exchange
  * carries at most m counters per input partition — the 100 TB
  * replacement for `groupBy(item).count().orderBy(desc).limit(k)`,
  * which must shuffle the full item keyspace (web-scale n-gram
  * vocabularies run to billions of keys). `hotReport` additionally
  * computes exact counts for its own verdict columns — fine at test
  * scale, and still one shuffle of the (small) distinct-item space;
  * production pipelines at full scale read `frequentItems` alone.
  */
object HeavyHitters {

  /** MG summary of `itemCol` over the whole frame: one global
    * aggregation, returns (item, est) rows est-descending. Membership
    * and est carry the MG bounds (est <= f <= est + N/(m+1)); every
    * item with share > 1/(m+1) is guaranteed present. */
  def frequentItems(df: DataFrame, itemCol: Column, m: Int): DataFrame =
    df.agg(FrequentItems(itemCol, m).as("_s"))
      .select(explode(col("_s")).as("e"))
      .select(col("e.item").as("item"), col("e.est").as("est"))

  /** Deterministic hot-item report: exact counts restricted to the
    * items the MG guarantee PROVES are in the sketch (f > N/(m+1)),
    * each row carrying the sketch-invariant verdicts:
    *
    *   in_sketch — the item appears in the MG summary (guaranteed);
    *   est_ok    — est <= f and f - est <= N/(m+1) (the MG bound).
    *
    * Borderline sketch members (f <= N/(m+1)) are NOT reported: their
    * membership depends on input/merge order. The surfaced rows are
    * exact counts + provably-TRUE booleans — independent of
    * partitioning, hash-stable, and SQL-expressible for the oracle. */
  def hotReport(df: DataFrame, itemCol: Column, m: Int): DataFrame = {
    val items = df.select(itemCol.as("item")).where(col("item").isNotNull)
    val exact = items.groupBy("item").agg(count(lit(1)).as("n"))
    val total = items.agg(count(lit(1)).as("total"))
    val sketch = frequentItems(items, col("item"), m)
    exact
      .crossJoin(broadcast(total))
      .where(col("n") * (m + 1) > col("total")) // f > N/(m+1), exact integers
      .join(broadcast(sketch), Seq("item"), "left")
      .select(
        col("item"),
        col("n"),
        col("est").isNotNull.as("in_sketch"),
        (col("est").isNotNull && col("est") <= col("n") &&
          (col("n") - col("est")) * (m + 1) <= col("total")).as("est_ok"))
      .orderBy(col("n").desc, col("item"))
  }
}
