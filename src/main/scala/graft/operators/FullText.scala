package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Full-text search over a document corpus — the analogue of the
  * reference's inverted-index search engine (fulltext.rs:1-968:
  * tokenize → posting lists → match_all/match_any → score), re-expressed
  * as the explode → filter-to-query-terms → groupBy inverted-index
  * shape, the same machinery the Jaccard dedup family uses
  * (Dedup.scala).
  *
  * Scale design: the per-term filter runs BEFORE the aggregation
  * shuffle, so the shuffled volume is proportional to the QUERY terms'
  * postings, not the corpus vocabulary — exactly what a materialized
  * inverted index buys, without maintaining one (at 100 TB the index
  * build is itself this explode+filter scan; a standing index would be
  * this frame written out, bucketed by term). Everything is
  * `org.apache.spark.sql.functions` — codegen'd, no UDFs.
  */
object FullText {

  /** Query-term postings: one row per (doc, query term) with its term
    * frequency. Tokenization is whitespace, matching the corpus format
    * (and the fingerprint/token-stats operators in TextAnalysis). */
  def postings(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .where(col("term").isin(terms.distinct: _*))

  /** Documents containing EVERY query term, ranked by total term
    * frequency then doc id (fulltext.rs match-all + tf scoring). One
    * shuffle: postings aggregate per doc with a distinct-term count
    * enforcing the conjunction. */
  def searchAll(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame =
    postings(docs, idCol, textCol, terms)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("score"), count_distinct(col("term")).as("_nt"))
      .where(col("_nt") === terms.distinct.length)
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))

  /** Documents containing ANY query term, ranked the same way. */
  def searchAny(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame =
    postings(docs, idCol, textCol, terms)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("score"))
      .orderBy(col("score").desc, col("doc_id"))

  /** BM25-ranked search (k1 = 1.2, b = 0.75, Lucene's +1 idf variant —
    * the relevance scoring the reference's fulltext ranking approximates
    * with tf, upgraded to the standard formula):
    *
    *   w(t,d) = ln((N - df + 0.5)/(df + 0.5) + 1) · tf·(k1+1)
    *            / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * Scale shape: corpus stats (N, avgdl) are one tiny broadcast frame;
    * per-term df aggregates over query-term postings only; the scoring
    * join broadcasts df. One corpus scan, one postings shuffle — same
    * cost as searchAny. Constants are spelled as the same double
    * literals and in the same association order as the SQL oracle, so
    * scores are bit-deterministic across engines. */
  def searchBm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    val withLen = docs.select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("double").as("dl"),
        col("toks"))
    val stats = withLen.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = withLen
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .where(col("term").isin(terms.distinct: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    val idf = log((col("n_docs") - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)) + lit(1.0))
    val denom = col("tf") +
      lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) * col("dl") / col("avgdl"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("w", idf * col("tf") * lit(2.2) / denom)
      .groupBy(col("doc_id"))
      .agg(sum(col("w")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
  }
}
