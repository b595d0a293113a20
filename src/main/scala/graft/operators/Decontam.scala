package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — a training-data hygiene step with no
  * analogue in the reference ([REF-GAP], pipeline extension):
  * training documents that share word n-grams with an evaluation /
  * benchmark corpus leak test answers into the model, so large-scale
  * curation measures per-document n-gram collision with the eval set
  * and drops (or flags) the contaminated tail — the standard method
  * in the public contamination literature.
  *
  * 100 TB shape: the eval side is TINY (benchmark suites are
  * thousands of documents, the corpus is billions), so its distinct
  * shingle set broadcasts; the train side is one explode + broadcast
  * semi-join + per-doc count. The corpus itself never shuffles —
  * only the (doc_id, hit) pairs that actually collide do, and the
  * final join back to full rows is a broadcast of the (rare)
  * contaminated id set.
  */
object Decontam {

  /** Per-train-document count of distinct `n`-gram shingles that
    * appear anywhere in the eval corpus. Documents with zero overlap
    * are absent (count them clean). */
  def overlap(train: DataFrame, eval: DataFrame, n: Int): DataFrame = {
    val evalShingles = eval
      .select(explode(Dedup.shingleSet(col("text"), n)).as("tok"))
      .distinct()
    val trainTok = train.select(col("doc_id"),
      explode(Dedup.shingleSet(col("text"), n)).as("tok"))
    trainTok.join(broadcast(evalShingles), "tok")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
  }

  /** The train corpus with contaminated documents removed: keep a
    * document only when its eval overlap is strictly under
    * `maxOverlap` shingles. */
  def clean(train: DataFrame, eval: DataFrame, n: Int,
      maxOverlap: Long): DataFrame = {
    val bad = overlap(train, eval, n)
      .where(col("n_overlap") >= maxOverlap).select("doc_id")
    train.join(broadcast(bad), Seq("doc_id"), "left_anti")
  }

  /** Span-level decontamination: instead of dropping whole documents,
    * emit the maximal token intervals of each train document covered
    * by eval n-grams — `(doc_id, span_start, span_end)`, 1-based, end
    * exclusive — so the pipeline can MASK the leaked windows and keep
    * the rest (how modern pipelines treat mostly-clean documents with
    * one quoted benchmark item). Same broadcast shape as `overlap`;
    * the interval merge is SubstringDedup's per-document fold — no
    * corpus-wide window. */
  def contaminatedSpans(train: DataFrame, eval: DataFrame,
      n: Int): DataFrame = {
    val evalGrams = eval
      .select(explode(array_distinct(
        QualityFilters.ngrams(col("text"), n))).as("gram"))
      .distinct()
    val occ = train.select(col("doc_id"),
        posexplode(QualityFilters.ngrams(col("text"), n))
          .as(Seq("p0", "gram")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        col("gram"))
    occ.join(broadcast(evalGrams), "gram")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("ps"))
      .select(col("doc_id"),
        explode(SubstringDedup.mergePositions(col("ps"), n)).as("sp"))
      .select(col("doc_id"), col("sp.s").as("span_start"),
        col("sp.e").as("span_end"))
  }
}
