package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the vocabulary operators: top-k cut determinism, OOV
  * coverage arithmetic, TF-IDF keyword ranking — each checked against a
  * hand-computable fixture plus plan-shape assertions for the scale
  * contracts (literal vocab fold-in, no corpus-wide window). */
class VocabularySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tiny = Seq(
    (1L, "a a a b c"),
    (2L, "a b b d"),
    (3L, "c c e")
  ).toDF("doc_id", "text")

  // ------------------------------------------------------------ topK

  test("topK ranks by count desc then token asc, cut is deterministic") {
    // counts: a=4, b=3, c=3, d=1, e=1 — ties (b,c) and (d,e) break asc
    val v = Vocabulary.topK(tiny, 4).as[(String, Long)].collect()
    assert(v === Array(("a", 4L), ("b", 3L), ("c", 3L), ("d", 1L)))
  }

  // -------------------------------------------------------- oovStats

  test("oovStats counts tokens outside the top-k vocabulary") {
    // k=2 vocab = {a, b}; doc1 has 1 OOV (c), doc2 has 1 (d), doc3 has 3.
    // The ratio surfaces as a half-up scaled integer (ratio * 1e9).
    val o = Vocabulary.oovStats(tiny, 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(o === Array(
      (1L, 5L, 1L, 200000000L),
      (2L, 4L, 1L, 250000000L),
      (3L, 3L, 3L, 1000000000L)))
  }

  test("oovStats ratio rounds half-up in exact integer arithmetic") {
    // 1/3 -> 333333333.33e9 rounds DOWN; 2/3 -> 666666666.67e9 rounds UP
    val d = Seq((1L, "x a a"), (2L, "x x a")).toDF("doc_id", "text")
    val o = Vocabulary.oovStats(d, 1) // vocab = {a} (count 3 vs x count 3, tie -> a)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(o === Array((1L, 3L, 1L, 333333333L), (2L, 3L, 2L, 666666667L)))
  }

  test("oovStats with a covering vocabulary reports zero OOV everywhere") {
    val o = Vocabulary.oovStats(tiny, 10)
    assert(o.where(col("n_oov") =!= 0 || col("oov_ratio_e9") =!= 0L).count() === 0)
  }

  test("oovStats per-doc pass is scan-stage: no join or exchange in the plan") {
    val plan = Vocabulary.oovStats(tiny, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"))
    assert(!plan.contains("Exchange"))
  }

  // --------------------------------------------------- tfidfKeywords

  test("tfidfKeywords ranks a document's terms by tf*ln(N/df), term asc ties") {
    val kw = Vocabulary.tfidfKeywords(tiny, 2)
      .orderBy("doc_id", "rank")
      .as[(Long, Long, String, Long)].collect()
    val n = 3.0
    // doc1: a tf=3 df=2 -> 3ln(1.5)=1.216; b tf=1 df=2 -> .405; c tf=1 df=2 -> .405
    //   rank1 = a, rank2 = b (tie with c broken by term asc)
    assert(kw(0)._1 === 1L && kw(0)._3 === "a")
    // the surfaced score is the e9-grid scaled integer (cross-engine
    // ln ulp snapped by floor(x*1e9 + 0.5))
    assert(kw(0)._4 === math.floor(3.0 * math.log(n / 2) * 1e9 + 0.5).toLong)
    assert(kw(1)._3 === "b")
    // doc2: b tf=2 df=2 -> .811 beats d tf=1 df=1 -> 0? no: ln(3/1)=1.099
    //   d scores 1*ln(3) = 1.099 > b 2*ln(1.5) = .811 -> rank1 = d
    assert(kw(2)._1 === 2L && kw(2)._3 === "d")
    assert(kw(3)._3 === "b")
    // doc3: e tf=1 df=1 -> ln(3)=1.099; c tf=2 df=2 -> 2ln(1.5)=.811
    assert(kw(4)._1 === 3L && kw(4)._3 === "e")
    assert(kw(5)._3 === "c")
  }

  test("tfidfKeywords emits at most k rows per document, ranks 1..k dense") {
    val kw = Vocabulary.tfidfKeywords(docs100, 3)
    val perDoc = kw.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"), min("rank").as("mn"))
    assert(perDoc.where(col("n") > 3 || col("mx") =!= col("n") ||
      col("mn") =!= 1).count() === 0)
  }

  test("tfidfKeywords has no window operator in the plan") {
    val plan = Vocabulary.tfidfKeywords(docs100, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
  }

  private def docs100 =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
}
