package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling"): score each raw
  * document by how much more likely its hashed bag-of-words is under a
  * TARGET corpus's unigram bucket model than under the raw corpus's
  * own — `log w(x) = sum over tokens ln(p_target[b(tok)] /
  * p_raw[b(tok)])` with add-one smoothing over k buckets — then keep
  * the highest-weight documents. The hashed-bucket trick is what makes
  * the models corpus-scale-free: both distributions live in k numbers
  * regardless of vocabulary size.
  *
  * Reference analogue: none — pipeline extension beside Decontam
  * (eval-set leakage) and Mixture (declared domain weights); DSIR is
  * the LEARNED mixture knob: let a small high-quality target corpus
  * define what to upweight.
  *
  * Determinism/oracle: the bucket is arithmetic over the md5 hex
  * digest (first hex digit -> 16 buckets by default), computable
  * bit-identically in any engine; selection is a total order
  * (scaled log-weight DESC, doc_id ASC). The surfaced log-weight is
  * the floor-scaled e6 integer — bucket log-ratios come out of `ln`
  * and the per-document sum is addition-order-sensitive in the last
  * ulps, which the e6 grid snap absorbs.
  *
  * 100 TB shape: the two bucket-count aggregations collapse map-side
  * to k rows each (k is tiny — driver-side by construction), and the
  * k log-ratios fold back into the SCAN as a literal array: scoring is
  * one `transform`+`aggregate` over each row's own token array — zero
  * joins, zero shuffles over the corpus. `select` adds one
  * TakeOrdered(m), never a global sort.
  */
object Dsir {

  /** Hash a token into one of 16 buckets: the first hex digit of its
    * md5, 0-based — exact and engine-portable (`strpos('0123456789'
    * || 'abcdef', ...) - 1` arithmetic in SQL). */
  def bucket(word: Column): Column = hexDigit(substring(md5(word), 1, 1))

  /** Per-document DSIR log importance weight against a target corpus:
    * (doc_id, n_tokens, logw_e6). Documents of the raw corpus only.
    * The weight surfaces as the floor-scaled e6 BIGINT
    * `floor(x*1e6 + 0.5)` — deterministic IEEE ops, never engine
    * `ROUND(double, n)`, whose output differs in the last ulp across
    * engines/versions on a hashed column. */
  def logWeights(raw: DataFrame, target: DataFrame): DataFrame = {
    val k = 16
    def bucketOf(w: Column): Column = bucket(w)
    def counts(df: DataFrame): (Array[Long], Long) = {
      val rows = df.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
        .select(bucketOf(col("w")).as("b"))
        .groupBy("b").agg(count(lit(1)).as("c"))
        .collect()
      val arr = Array.fill(k)(0L)
      rows.foreach(r => arr(r.getInt(0)) = r.getLong(1))
      (arr, arr.sum)
    }
    val (tc, tn) = counts(target)
    val (rc, rn) = counts(raw)
    val lr = (0 until k).map(b =>
      math.log((tc(b) + 1.0) / (tn + k)) - math.log((rc(b) + 1.0) / (rn + k)))
    val lrArr = array(lr.map(lit(_)): _*)
    val toks = TextAnalysis.tokens(col("text"))
    raw.select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      floor(aggregate(
        transform(toks, w => element_at(lrArr, bucketOf(w) + 1)),
        lit(0.0), (acc, v) => acc + v) * lit(1e6) + lit(0.5)).as("logw_e6"))
  }

  /** The m raw documents whose hashed bag-of-words looks most like the
    * target corpus (logw_e6 DESC, doc_id ASC — a total order). */
  def select(raw: DataFrame, target: DataFrame, m: Int): DataFrame =
    logWeights(raw, target)
      .orderBy(col("logw_e6").desc, col("doc_id"))
      .limit(m)

  /** Hex digit char -> 0..15 (the SQL `strpos(alphabet, c) - 1`). */
  private def hexDigit(c: Column): Column =
    when(c === "0", 0).when(c === "1", 1).when(c === "2", 2)
      .when(c === "3", 3).when(c === "4", 4).when(c === "5", 5)
      .when(c === "6", 6).when(c === "7", 7).when(c === "8", 8)
      .when(c === "9", 9).when(c === "a", 10).when(c === "b", 11)
      .when(c === "c", 12).when(c === "d", 13).when(c === "e", 14)
      .otherwise(15)
}
