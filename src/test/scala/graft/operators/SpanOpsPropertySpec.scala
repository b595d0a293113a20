package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the round-10 span/score operators against
  * brute-force in-memory references on arbitrary small corpora. */
class SpanOpsPropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // small alphabet so duplicated runs and chains actually occur
  private val genDoc: Gen[String] =
    Gen.chooseNum(1, 14).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c")).map(_.mkString(" ")))
  private val genCorpus: Gen[List[String]] =
    Gen.chooseNum(1, 8).flatMap(k => Gen.listOfN(k, genDoc))

  /** Brute-force reference of SubstringDedup.duplicatedSpans. */
  private def refSpans(corpus: List[(Long, String)], n: Int)
      : Set[(Long, Long, Long)] = {
    val occ = for {
      (id, text) <- corpus
      toks = text.split(" ")
      if toks.length >= n
      i <- 1 to (toks.length - n + 1)
    } yield (id, i.toLong, toks.slice(i - 1, i - 1 + n).mkString(" "))
    val byGram = occ.groupBy(_._3)
    val cut = occ.filter { case (id, pos, g) =>
      val all = byGram(g)
      all.size >= 2 && (all.map(o => (o._1, o._2)).min != ((id, pos)))
    }
    cut.groupBy(_._1).flatMap { case (id, os) =>
      val ps = os.map(_._2).sorted
      val spans = ps.foldLeft(List.empty[(Long, Long)]) {
        case (acc, p) if acc.nonEmpty && p <= acc.head._2 =>
          (acc.head._1, p + n) :: acc.tail
        case (acc, p) => (p, p + n) :: acc
      }
      spans.map { case (s, e) => (id, s, e) }
    }.toSet
  }

  test("duplicatedSpans equals the brute-force reference on arbitrary corpora") {
    import spark.implicits._
    val p = Prop.forAll(genCorpus, Gen.oneOf(2, 3)) { (texts, n) =>
      val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = SubstringDedup.duplicatedSpans(corpus.toDF("doc_id", "text"), n)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = refSpans(corpus, n)
      if (got != want) {
        println(s"corpus=$corpus n=$n\n got=$got\nwant=$want"); false
      } else true
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), p)
    assert(res.passed, res.status.toString)
  }

  test("DSIR of a corpus against itself weighs every document zero") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(120)
    val w = Dsir.logWeights(docs, docs)
    assert(w.where(col("logw_e6") =!= 0L).count() === 0)
    assert(w.count() === 120)
  }

  test("perplexity is always >= 1 (probabilities never exceed 1)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val r = Perplexity.score(docs)
    assert(r.where(col("ppl_e6") < 1000000L).count() === 0)
  }
}
