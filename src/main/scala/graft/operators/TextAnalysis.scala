package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: token statistics, quality
  * scoring, language-ID heuristic, document fingerprinting. All pure
  * `org.apache.spark.sql.functions` (codegen'd; no UDFs), so the whole
  * stage stays in WholeStageCodegen and scales linearly with the
  * corpus.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(text, " ")

  /** Per-document quality metrics: token count, distinct tokens,
    * type-token ratio, average token length, stopword ratio. All
    * ratios are divisions of exact integers — engine-exact doubles. */
  def qualityMetrics(docs: DataFrame, stopwords: Seq[String]): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks)
    val stops = filter(toks, w => w.isInCollection(stopwords))
    docs.select(
      col("doc_id"),
      nTok.as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct"),
      (size(array_distinct(toks)).cast("double") / nTok).as("ttr"),
      ((length(col("text")) - nTok + 1).cast("double") / nTok).as("avg_tok_len"),
      (size(stops).cast("double") / nTok).as("stop_ratio"))
  }

  /** Marker-set language scoring: count hits per language marker list,
    * predict the argmax with a fixed tie order. A real pipeline would
    * use char-n-gram profiles; the scoring/argmax plumbing is the
    * operator under test and is deterministic by construction. */
  def langId(docs: DataFrame, markers: Seq[(String, Seq[String])]): DataFrame = {
    val toks = tokens(col("text"))
    val scored = docs.select(
      (Seq(col("doc_id"), col("lang")) ++ markers.map { case (lang, ws) =>
        size(filter(toks, w => w.isInCollection(ws))).as(s"score_$lang")
      }).toIndexedSeq: _*)
    // argmax with ties resolved in declaration order
    val pred = markers.reverse.foldLeft(lit(markers.last._1)) {
      case (acc, (lang, _)) =>
        val isMax = markers.filter(_._1 != lang).foldLeft(lit(true)) {
          case (c, (other, _)) =>
            c && col(s"score_$lang") >= col(s"score_$other")
        }
        when(isMax, lang).otherwise(acc)
    }
    scored.withColumn("pred", pred)
  }

  /** Adjacent-pair statistics — the candidate table of a BPE merge
    * step: each pair's corpus count plus a count-normalized affinity
    * (`n / (count(left)·count(right))` — high when two tokens appear
    * mostly together). 100 TB shape: the unigram and pair tables are
    * vocabulary-sized, so both frequency joins broadcast; the only
    * corpus-sized work is the two exploding scans, each collapsed by
    * map-side partial aggregation before its shuffle. */
  def bpePairStats(docs: DataFrame, k: Int): DataFrame = {
    val uni = docs.select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
    val pairs = docs
      .select(explode(QualityFilters.ngrams(col("text"), 2)).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .withColumn("_l", split(col("pair"), " ").getItem(0))
      .withColumn("_r", split(col("pair"), " ").getItem(1))
    pairs
      .join(broadcast(uni.select(col("w").as("_l"), col("wc").as("_lc"))), "_l")
      .join(broadcast(uni.select(col("w").as("_r"), col("wc").as("_rc"))), "_r")
      .select(col("pair"), col("n"),
        (col("n").cast("double") / (col("_lc") * col("_rc"))).as("affinity"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
  }

  /** Normalized content fingerprint: lowercase, strip non [a-z ],
    * collapse runs of spaces, trim, md5. Two documents differing only
    * in punctuation/casing/whitespace collide. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z ]", ""), " +", " ")))
}
