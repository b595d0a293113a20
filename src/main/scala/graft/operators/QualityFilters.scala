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
  * 100 TB shape: ZERO shuffles. Every n-gram of a document lives on
  * that document's row, so the repetition profile is a per-row
  * computation — the native `repetition_stats` expression
  * (graft.functions.RepetitionStats) counts gram occurrences in one
  * codegen'd hash pass per row, and the whole gate stays in the scan
  * stage. The earlier explode + (doc_id, gram) two-level aggregation
  * shipped every corpus gram (long string keys) through two exchanges
  * and then joined the orders back together; at 100 TB that exchange
  * is the entire job, here it simply does not exist.
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
  def repetitionMetrics(docs: DataFrame, n: Int): DataFrame =
    docs.select(col("doc_id"),
        graft.functions.RepetitionStats(ngrams(col("text"), n)).as("_st"))
      .where(col("_st.n_grams") > 0)
      .select(col("doc_id"), col("_st.n_grams").as("n_grams"),
        (col("_st.top").cast("double") / col("_st.n_grams")).as("top_gram_frac"),
        (col("_st.dup").cast("double") / col("_st.n_grams")).as("dup_gram_frac"))

  /** The combined Gopher-style repetition gate: a document passes when
    * its top-2-gram coverage and duplicate-3-gram coverage both fall
    * under the given thresholds (Gopher §A1.1 uses 0.20 for top
    * 2-grams and 0.60-ish family thresholds for duplicated n-grams).
    * Returns (doc_id, top_2gram_frac, dup_3gram_frac, passes) for
    * every document long enough to have 3-grams. */
  def repetitionGate(docs: DataFrame, maxTop2: Double,
      maxDup3: Double): DataFrame =
    // both orders in ONE scan-stage select — no metrics join: a doc
    // with 3-grams always has 2-grams, so the 3-gram presence filter
    // reproduces the former inner join's row set exactly
    docs.select(col("doc_id"),
        graft.functions.RepetitionStats(ngrams(col("text"), 2)).as("_s2"),
        graft.functions.RepetitionStats(ngrams(col("text"), 3)).as("_s3"))
      .where(col("_s3.n_grams") > 0)
      .select(col("doc_id"),
        (col("_s2.top").cast("double") / col("_s2.n_grams")).as("top_2gram_frac"),
        (col("_s3.dup").cast("double") / col("_s3.n_grams")).as("dup_3gram_frac"))
      .withColumn("passes",
        col("top_2gram_frac") <= lit(maxTop2) &&
          col("dup_3gram_frac") <= lit(maxDup3))
}
