package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Literal, StringReplace}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: LEARN a merge list from the corpus
  * (Sennrich et al. 2016) and APPLY it scan-stage — the tokenizer
  * half that `TextAnalysis.bpePairStats` (the candidate-pair table)
  * feeds.
  *
  * Reference analogue: DriftDB has no tokenizer surface; pipeline
  * extension beside the other curation operators.
  *
  * Representation: a word is its characters space-joined plus a
  * word-end marker ("low" -> "l o w </w>"). A merge (l, r) rewrites
  * every occurrence of adjacent symbols "l r" as the single symbol
  * "lr". Both learning and encoding operate on space-padded symbol
  * STRINGS with literal (non-regex) replace — " l r " -> " lr " —
  * which is exactly the batch-merge BPE step: left-to-right,
  * non-overlapping, all occurrences per round. Cross-word merges
  * cannot happen structurally: every word ends with the </w> symbol,
  * pairs whose LEFT side is (or ends with) </w> are never inside any
  * single word's representation, so they are never learned, so the
  * whole-document encode string never matches one across a boundary.
  *
  * 100 TB shape:
  *  - `learn` builds the word-FREQUENCY table once (one shuffle; the
  *    vocabulary is corpus-sublinear) and then runs k rounds of ONE
  *    vocabulary-sized aggregation each — the honest BPE cost. Learn
  *    on a deterministic sample (`Sampling`) for very large corpora,
  *    as real tokenizer pipelines do, then encode the full corpus.
  *  - `encode` is pure scan-stage: one symbol string per document and
  *    |merges| nested literal replaces inside whole-stage codegen —
  *    no UDF, no shuffle, no per-round corpus pass.
  */
object Bpe {

  val WordEnd = "</w>"

  /** Literal (non-regex) replace via the native catalyst expression —
    * arbitrary corpus characters need no escaping. */
  private def strReplace(src: Column, find: String, repl: String): Column =
    GraftBridge.column(StringReplace(GraftBridge.expression(src),
      Literal(find), Literal(repl)))

  /** One word's symbol string: "low" -> "l o w </w>". */
  private[operators] def wordRepr(word: Column): Column =
    concat(array_join(split(word, ""), " "), lit(" " + WordEnd))

  /** One merge on a space-PADDED symbol string: " l r " -> " lr ". */
  private def applyMerge(padded: Column, l: String, r: String): Column =
    strReplace(padded, s" $l $r ", s" $l$r ")

  /** Learn `k` merges: each round takes the most frequent adjacent
    * symbol pair over the word-frequency table (count DESC, pair ASC
    * on ties — deterministic) and merges it everywhere. Returns the
    * ordered merge list; stops early if the vocabulary runs out of
    * pairs (every word a single symbol). */
  def learn(docs: DataFrame, k: Int): Seq[(String, String)] = {
    require(k >= 0, s"need k >= 0 (got $k)")
    var words = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(concat(lit(" "), wordRepr(col("w")), lit(" ")).as("repr"),
        col("freq"))
      .localCheckpoint()
    val out = Seq.newBuilder[(String, String)]
    var n = 0
    var exhausted = false
    while (n < k && !exhausted) {
      val top = words
        .select(explode(QualityFilters.ngrams(trim(col("repr")), 2)).as("pair"),
          col("freq"))
        .groupBy("pair").agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val Array(l, r) = top(0).getString(0).split(" ", 2)
        out += ((l, r))
        n += 1
        val next = words
          .select(applyMerge(col("repr"), l, r).as("repr"), col("freq"))
          .localCheckpoint()
        graft.Pins.free(words)
        words = next
      }
    }
    graft.Pins.free(words)
    out.result()
  }

  /** Tokenize documents with an ordered merge list:
    * (doc_id, tokens ARRAY<STRING>, n_tokens). */
  def encode(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val words = filter(TextAnalysis.tokens(col("text")),
      w => length(w) > 0)
    // words are joined by a DOUBLE space: literal replace is
    // non-overlapping left-to-right and resumes after the replaced
    // segment, so a word-final merge (" low </w> " -> " low</w> ")
    // consumes its trailing space — with a single separator the NEXT
    // word's occurrence would lose its leading boundary and skip.
    // Within a word single spaces are correct: greedy non-overlapping
    // is exactly the batch-merge BPE step ("a a a" -> "aa a").
    val doc0 = concat(lit(" "),
      array_join(transform(words, w => wordRepr(w)), "  "), lit(" "))
    val merged = merges.foldLeft(doc0) {
      case (acc, (l, r)) => applyMerge(acc, l, r)
    }
    docs.select(col("doc_id"),
      when(length(trim(merged)) === 0, array().cast("array<string>"))
        .otherwise(split(trim(merged), " +")).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }
}
