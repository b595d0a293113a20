package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus vocabulary operators for tokenizer / coverage analysis: the
  * top-k vocabulary by corpus frequency, per-document out-of-vocabulary
  * statistics against that vocabulary, and per-document TF-IDF keyword
  * extraction.
  *
  * Reference analogue: DriftDB has no vocabulary surface; these are
  * pipeline extensions in the spirit of its full-text index's term
  * statistics (crates/driftdb-core/src/fulltext/mod.rs — df counts per
  * term) generalized to corpus-level curation signals.
  *
  * 100 TB shape:
  *  - `topK` is ONE token-keyed aggregation (map-side partial agg
  *    collapses each scan partition to its distinct tokens before the
  *    exchange) followed by TakeOrdered(k) — no global sort.
  *  - `oovStats` folds the k-row vocabulary back as a LITERAL in-list
  *    (k is bounded, driver-side by construction), so the per-document
  *    pass is pure scan-stage WholeStageCodegen: zero joins, zero
  *    shuffles, zero explodes over the corpus.
  *  - `tfidfKeywords` shuffles once to build the (doc, term) tf table;
  *    the document-frequency side is vocabulary-sized and broadcasts;
  *    the per-document top-k is an `array_sort` over each document's
  *    own term list — per-group state is bounded by document size, so
  *    no window sort over the corpus-scale tf table.
  */
object Vocabulary {

  /** Top-k vocabulary by total occurrence count (count DESC, token ASC
    * on ties — a total order, so the cut is deterministic). */
  def topK(docs: DataFrame, k: Int): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term"))
      .limit(k)

  /** Per-document out-of-vocabulary stats against the corpus top-k
    * vocabulary: token count, OOV count, OOV ratio. The vocabulary is
    * materialized driver-side (bounded: exactly k strings) and folded
    * into the scan as a literal membership test.
    *
    * The ratio surfaces as `oov_ratio_e9` — the ratio scaled by 1e9
    * and rounded HALF-UP via pure integer arithmetic
    * (`(2*n_oov*1e9 + n_tokens) div (2*n_tokens)`), never as a
    * rounded DOUBLE: `ROUND(double, 9)` lands on different last-ulp
    * doubles across engines/versions, so a hashed ratio column must
    * be integer-exact by construction. Overflow-safe: the numerator
    * stays under 2^63 for any document below ~4.6e9 tokens. */
  def oovStats(docs: DataFrame, k: Int): DataFrame = {
    val vocab = topK(docs, k).select("term").collect().map(_.getString(0))
    val toks = TextAnalysis.tokens(col("text"))
    val oov = filter(toks, t => !t.isInCollection(vocab.toSeq))
    docs.select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(oov).cast("long").as("n_oov"))
      .withColumn("oov_ratio_e9",
        expr("(2 * n_oov * 1000000000L + n_tokens) div (2 * n_tokens)"))
  }

  /** Per-document top-k keywords by TF-IDF (`tf * ln(N/df)`), ranked
    * score DESC then term ASC. Output: (doc_id, rank, term,
    * score_e9) with score_e9 = the score scaled by 1e9 and half-up'd
    * via `floor(x*1e9 + 0.5)` — deterministic IEEE ops, never engine
    * `ROUND(double, n)` (which differs in the last ulp across
    * engines/versions on a hashed column). Both the RANKING and the
    * surfaced value use the scaled integer: engine `ln`s differ in
    * the last ulp, so two mathematically-equal scores from different
    * arguments (2·ln 4 vs 4·ln 2) could order oppositely across
    * engines at full precision — snapping to the e9 grid first makes
    * such pairs exact ties, which the term-ASC tie-break then orders
    * identically everywhere.
    *
    * The ranking runs INSIDE each document's aggregated term array
    * (`array_sort` with an explicit comparator + `slice`), not as a
    * `row_number()` window over the corpus-wide tf table — per-group
    * state is one document's distinct terms, bounded by document size
    * regardless of corpus size. */
  def tfidfKeywords(docs: DataFrame, k: Int): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val scored = tf
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("score_e9",
        floor(col("tf").cast("double") * log(col("n_docs") / col("df"))
          * lit(1e9) + lit(0.5)))
    scored
      .groupBy("doc_id")
      .agg(collect_list(struct(col("score_e9"), col("term"))).as("kws"))
      .select(col("doc_id"), posexplode(slice(array_sort(col("kws"),
        (l, r) => when(l("score_e9") > r("score_e9"), -1)
          .when(l("score_e9") < r("score_e9"), 1)
          .otherwise(when(l("term") < r("term"), -1)
            .when(l("term") > r("term"), 1).otherwise(0))), 1, k))
        .as(Seq("rank0", "kw")))
      .select(col("doc_id"), (col("rank0") + 1).cast("long").as("rank"),
        col("kw.term").as("term"), col("kw.score_e9").as("score_e9"))
  }
}
