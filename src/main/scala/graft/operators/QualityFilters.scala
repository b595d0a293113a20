package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-based quality filters for pretraining corpora — the
  * "Gopher rules" (Rae et al. 2021, "Scaling Language Models", §A1.1):
  * documents dominated by a few repeated n-grams are boilerplate or
  * spam and get dropped before training. The reference has no quality
  * surface at all (pipeline extension); `TextAnalysis.qualityMetrics`
  * covers the length/stopword family, this covers the repetition
  * family.
  *
  * Metrics per document and n-gram order n:
  *   - `top_gram_frac`  — tokens covered by the single most frequent
  *     n-gram, over all n-gram-covered tokens (Gopher's "fraction of
  *     characters in the most common n-gram", token-weighted since the
  *     fixture corpus has no punctuation to delimit anything else).
  *   - `dup_gram_frac`  — fraction of n-gram occurrences whose gram
  *     appears more than once (Gopher's "fraction of characters in
  *     duplicated n-grams").
  *
  * 100 TB shape: one explode per n-gram order, then a two-level
  * aggregation keyed (doc_id, gram) → doc_id. Both shuffles are on
  * keys that include doc_id, so partial (map-side) aggregation
  * collapses each document's grams before anything moves — the shuffle
  * volume is bounded by distinct grams per doc, not corpus tokens. No
  * driver state, no windows over the whole corpus.
  *
  * All ratios are exact-integer divisions cast to double, so the
  * numbers are bit-identical in any engine — the DuckDB oracle applies
  * the same arithmetic (q_quality_repetition).
  */
object QualityFilters {

  /** Adjacent n-grams of the space-split token array, as
    * space-joined strings: element i covers tokens [i, i+n). Pure
    * per-row array arithmetic — stays in the scan stage. */
  def ngrams(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    // guard: sequence(1, 0) would count DOWN; short docs get no grams
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Per-document repetition metrics for one n-gram order. Output:
    * (doc_id, n_grams, top_gram_frac, dup_gram_frac). Documents
    * shorter than n tokens produce no grams and are absent — the
    * caller decides whether absence passes or fails. */
  def repetitionMetrics(docs: DataFrame, n: Int): DataFrame = {
    val grams = docs.select(col("doc_id"),
      explode(ngrams(col("text"), n)).as("gram"))
    grams.groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_grams"),
        max("c").as("_top"),
        coalesce(sum(when(col("c") > 1, col("c"))), lit(0L)).as("_dup"))
      .select(col("doc_id"), col("n_grams"),
        (col("_top").cast("double") / col("n_grams")).as("top_gram_frac"),
        (col("_dup").cast("double") / col("n_grams")).as("dup_gram_frac"))
  }

  /** The combined Gopher-style repetition gate: a document passes when
    * its top-2-gram coverage and duplicate-3-gram coverage both fall
    * under the given thresholds (Gopher §A1.1 uses 0.20 for top
    * 2-grams and 0.60-ish family thresholds for duplicated n-grams).
    * Returns (doc_id, top_2gram_frac, dup_3gram_frac, passes) for
    * every document long enough to have 3-grams. */
  def repetitionGate(docs: DataFrame, maxTop2: Double,
      maxDup3: Double): DataFrame = {
    val m2 = repetitionMetrics(docs, 2)
      .select(col("doc_id"), col("top_gram_frac").as("top_2gram_frac"))
    val m3 = repetitionMetrics(docs, 3)
      .select(col("doc_id"), col("dup_gram_frac").as("dup_3gram_frac"))
    m2.join(m3, "doc_id")
      .withColumn("passes",
        col("top_2gram_frac") <= lit(maxTop2) &&
          col("dup_3gram_frac") <= lit(maxDup3))
  }
}
