package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixture for the bigram-LM perplexity score plus the
  * broadcast-join plan contract. */
class PerplexitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tiny = Seq(
    (1L, "a b a b"),
    (2L, "a b"),
    (3L, "c")
  ).toDF("doc_id", "text")

  test("perplexity matches the closed-form add-1 bigram model") {
    // uni: a=3, b=3, c=1 -> V=3; bigrams: "a b"=3, "b a"=1
    // P(a b) = (3+1)/(3+3) = 2/3;  P(b a) = (1+1)/(3+3) = 1/3
    // doc1 pairs [a b, b a, a b]: ppl = (27/4)^(1/3); doc2: ppl = 3/2
    val r = Perplexity.score(tiny).orderBy("doc_id")
      .as[(Long, Long, Long)].collect()
    assert(r.length === 2) // doc3 has no pairs and is absent
    assert(r(0)._1 === 1L && r(0)._2 === 3L)
    assert(math.abs(r(0)._3 / 1e6 - math.cbrt(27.0 / 4)) < 1e-6)
    assert(r(1)._1 === 2L && r(1)._2 === 1L)
    assert(math.abs(r(1)._3 / 1e6 - 1.5) < 1e-6)
  }

  test("a document of corpus-typical bigrams scores lower ppl than rare ones") {
    val docs = Seq(
      (1L, "x y x y x y x y"), (2L, "x y x y x y x y"),
      (3L, "x y x y x y x y"), (4L, "q r s t u v w z")
    ).toDF("doc_id", "text")
    val r = Perplexity.score(docs).orderBy("doc_id")
      .as[(Long, Long, Long)].collect()
    assert(r(0)._3 < r(3)._3)
  }

  test("minCount caps the broadcast model: above-cap bigrams score identically") {
    // bigrams: "a b"=3 (survives cap 2), "b a"=1 (dropped -> c2 = 0)
    val capped = Perplexity.score(tiny, minCount = 2L).orderBy("doc_id")
      .as[(Long, Long, Long)].collect()
    val full = Perplexity.score(tiny).orderBy("doc_id")
      .as[(Long, Long, Long)].collect()
    // doc2's only pair "a b" is above the cap -> identical to cap-off
    assert(capped(1) === full(1))
    // doc1 carries the dropped "b a": it takes the smoothed floor
    // P(b a) = (0+1)/(3+3) = 1/6 -> ppl = ((2/3)^2 / 6)^(-1/3)
    assert(math.abs(capped(0)._3 / 1e6 - math.cbrt(13.5)) < 1e-6)
    // the capped model table still broadcasts
    val plan = Perplexity.score(tiny, minCount = 2L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("probability joins broadcast; no sort-merge join in the plan") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    val plan = Perplexity.score(docs).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
