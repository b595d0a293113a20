package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

/** Exact-substring deduplication — the span-level form of exact dedup
  * (Lee et al. 2022, "Deduplicating Training Data Makes Language
  * Models Better"): any token run of length >= n that occurs more than
  * once in the corpus is cut from every occurrence EXCEPT the globally
  * first. Unlike document-level dedup this removes boilerplate that
  * rides inside otherwise-unique documents (licence headers,
  * navigation chrome, quoted replies).
  *
  * Reference analogue: none (DriftDB has no corpus surface) — pipeline
  * extension beside `Dedup` (document-level) and `Decontam`
  * (cross-corpus n-gram collision, Decontam.scala).
  *
  * Contract: `duplicatedSpans` returns per-document MAXIMAL token
  * intervals to cut — `(doc_id, span_start, span_end)`, 1-based token
  * indices, end exclusive — formed by merging every overlapping or
  * adjacent duplicated n-gram window. Keep-first: a duplicated gram's
  * globally first occurrence (lexicographic min of (doc_id, pos)) is
  * not cut, so one copy of every substring always survives. Emitting
  * spans rather than rewritten text keeps the operator composable —
  * the cut itself is a per-row `slice` over the token array.
  *
  * 100 TB shape: two gram-keyed aggregations with map-side partial
  * collapse (occurrence counts + global first occurrence) and one
  * shuffle join of occurrences back to their gram stats — all keyed on
  * content, nothing quadratic; the interval merge happens INSIDE each
  * document's own sorted position array (an `aggregate` fold, state
  * bounded by document length), so no corpus-wide window sort exists
  * anywhere in the plan.
  */
object SubstringDedup {

  private val spanType = ArrayType(StructType(Seq(
    StructField("s", LongType, nullable = false),
    StructField("e", LongType, nullable = false))))

  /** Merge a sorted array of duplicated-gram start positions (each
    * covering [p, p+n)) into maximal [s, e) intervals. Shared with
    * Decontam.contaminatedSpans — any "mask these n-gram windows"
    * operator ends at this fold. */
  private[operators] def mergePositions(sorted: Column, n: Int): Column =
    aggregate(sorted, array().cast(spanType),
      (acc, p) => {
        val last = element_at(acc, -1)
        val grown = concat(slice(acc, lit(1), size(acc) - 1),
          array(struct(last.getField("s").as("s"), (p + n).cast("long").as("e"))))
        val appended = concat(acc,
          array(struct(p.cast("long").as("s"), (p + n).cast("long").as("e"))))
        when(size(acc) === 0 || p > last.getField("e"), appended)
          .otherwise(grown)
      })

  /** Maximal cut spans per document: every token interval covered by
    * duplicated n-grams whose occurrence is not the global first. */
  def duplicatedSpans(docs: DataFrame, n: Int): DataFrame = {
    // the per-position n-gram explode multiplies text bytes ~n-fold
    // before the gram-partitioned window shuffle — size the exchange
    // from the docs scan (see ShuffleSizing: undersize is fatal at
    // corpus scale, oversize is AQE-coalesced)
    graft.ShuffleSizing.ensureForScan(docs, expansion = 4.0 * math.max(1, n))
    val occ = docs.select(col("doc_id"),
        posexplode(QualityFilters.ngrams(col("text"), n)).as(Seq("p0", "gram")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("gram"))
    // occurrence count + global first occurrence as ONE window over the
    // gram partitioning: the corpus-sized occurrence frame shuffles
    // once, where the former (groupBy gram -> join back) pair shuffled
    // it twice — the round-10 df-cap discipline applied to grams
    val w = org.apache.spark.sql.expressions.Window.partitionBy("gram")
    val cut = occ
      .withColumn("df", count(lit(1)).over(w))
      .withColumn("first_occ", min(struct(col("doc_id"), col("pos"))).over(w))
      .where(col("df") >= 2 &&
        !(col("doc_id") === col("first_occ.doc_id") &&
          col("pos") === col("first_occ.pos")))
      .select("doc_id", "pos")
    cut.groupBy("doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("ps"))
      .select(col("doc_id"),
        explode(mergePositions(col("ps"), n)).as("sp"))
      .select(col("doc_id"), col("sp.s").as("span_start"),
        col("sp.e").as("span_end"))
  }
}
