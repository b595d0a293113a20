package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language-model perplexity scoring — the CCNet-style corpus
  * quality signal (Wenzek et al. 2020 score documents with a KenLM
  * 5-gram; the distributed plumbing is identical at order 2, and the
  * add-k bigram model keeps every probability a closed-form rational
  * that an ANSI-SQL oracle re-derives exactly).
  *
  * Reference analogue: DriftDB has no LM surface; this is a pipeline
  * extension alongside the Gopher repetition gate
  * (operators/QualityFilters.scala).
  *
  * Model: add-k smoothing over the corpus's own bigrams,
  * `P(w2|w1) = (c(w1 w2) + k) / (c(w1) + k·V)` with V = unigram
  * vocabulary size. Per document: `ppl = exp(-mean ln P)` over its
  * adjacent token pairs; documents with fewer than 2 tokens carry no
  * pairs and are absent from the output.
  *
  * 100 TB shape: the unigram and bigram count tables are
  * vocabulary-sized, not corpus-sized (map-side partial aggregation
  * collapses each scan partition to its distinct grams before the
  * exchange), so both probability joins BROADCAST; the only
  * corpus-scale work is the exploding pair scan and ONE doc-keyed
  * aggregation. For an open-vocabulary corpus whose bigram table
  * outgrows broadcast, `minCount` caps it: bigrams seen fewer than
  * `minCount` times are dropped from the broadcast table and take the
  * smoothed floor through the existing left join's zero-count
  * fallback — the cap changes broadcast size, not code shape. (Bigram
  * TYPE counts grow roughly linearly with corpus size, unlike the
  * unigram vocabulary, so the cap is what keeps the broadcast bounded
  * at 100 TB; minCount = 1 is the exact, cap-off configuration.)
  */
object Perplexity {

  /** Per-document bigram perplexity: (doc_id, n_pairs, ppl_e6).
    * `ppl_e6` is the perplexity scaled by 1e6 and half-up'd via
    * `floor(x*1e6 + 0.5)` — deterministic IEEE ops that snap the
    * order-sensitive last ulps of the mean-of-ln sum (and engine `ln`
    * ulp differences) to an exact integer grid; never engine
    * `ROUND(double, n)`, whose own output differs in the last ulp
    * across engines/versions on a hashed column. `minCount` drops
    * bigrams below that count from the broadcast model table (they
    * score as unseen); 1 = no cap. */
  def score(docs: DataFrame, k: Double = 1.0, minCount: Long = 1L): DataFrame = {
    val uni = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val biAll = docs
      .select(explode(QualityFilters.ngrams(col("text"), 2)).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("c2"))
    // the cap bounds the BROADCAST, not the model: dropped (rare)
    // bigrams fall through the left join to the smoothed c2 = 0 floor
    val bi = if (minCount <= 1L) biAll else biAll.where(col("c2") >= minCount)
    val vocab = uni.agg(count(lit(1)).cast("double").as("v"))
    val pairs = docs.select(col("doc_id"),
      explode(QualityFilters.ngrams(col("text"), 2)).as("pair"))
      .withColumn("w1", split(col("pair"), " ").getItem(0))
    pairs
      .join(broadcast(bi), Seq("pair"), "left")
      .join(broadcast(uni), Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("lnp", log(
        (coalesce(col("c2"), lit(0L)) + lit(k)) /
          (col("c1") + lit(k) * col("v"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pairs"),
        floor(exp(-avg(col("lnp"))) * lit(1e6) + lit(0.5)).as("ppl_e6"))
  }
}
