package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed span fixtures for exact-substring dedup plus
  * structural invariants on real data. */
class SubstringDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cuts every non-first occurrence, merging overlapping windows") {
    // "p q r" occurs at (1,1), (2,2), (2,6); "q r s" at (1,2), (2,7).
    // Keep-first spares doc1; doc2's cut positions {2, 6, 7} merge to
    // [2,5) and [6,10).
    val docs = Seq(
      (1L, "p q r s t u"),
      (2L, "z p q r w p q r s k")
    ).toDF("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpans(docs, 3)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long)].collect()
    assert(spans === Array((2L, 2L, 5L), (2L, 6L, 10L)))
  }

  test("a fully duplicated document collapses to one whole-doc span") {
    val docs = Seq(
      (1L, "m n o p q r"),
      (2L, "m n o p q r")
    ).toDF("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpans(docs, 3)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long)].collect()
    // doc1 is the global first occurrence of every gram — untouched;
    // doc2's positions 1..4 merge into the single interval [1, 7)
    assert(spans === Array((2L, 1L, 7L)))
  }

  test("spans are sorted, disjoint, >= n long, and inside the document") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val n = 8
    val spans = SubstringDedup.duplicatedSpans(docs, n)
    val withLen = spans.join(
      docs.select(col("doc_id"), size(split(col("text"), " ")).as("len")),
      "doc_id")
    assert(withLen.where(col("span_start") < 1 ||
      col("span_end") - col("span_start") < n ||
      col("span_end") > col("len") + 1).count() === 0)
    // disjoint and non-adjacent per doc (adjacent would have merged)
    val overlaps = spans.as("a").join(spans.as("b"),
      col("a.doc_id") === col("b.doc_id") &&
        col("a.span_start") < col("b.span_start") &&
        col("b.span_start") <= col("a.span_end"))
    assert(overlaps.count() === 0)
  }

  test("one occurrence shuffle, no join-back; the merge runs inside per-doc arrays") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = SubstringDedup.duplicatedSpans(docs, 8)
      .queryExecution.executedPlan.toString
    // gram stats ride ONE window over the gram partitioning — the
    // former (groupBy gram -> join back) pair is gone, so the
    // corpus-sized occurrence frame shuffles once, not twice
    assert(!plan.contains("Join"), s"join-back resurfaced:\n${plan.take(2000)}")
    // the only window partitions on gram (stats), never on doc order:
    // the interval merge stays a per-doc array fold
    val winSpecs = plan.linesIterator.filter(_.contains("windowspecdefinition"))
      .mkString("\n")
    assert(!winSpecs.contains("pos"),
      s"a positional window appeared — the merge left the per-doc fold:\n$winSpecs")
  }
}
