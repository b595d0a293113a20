package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Multinomial NB vs an independent in-memory computation of the same
  * add-one-smoothed model (with the identical 6-decimal per-term
  * rounding), plus behavioural laws: separable classes classify
  * perfectly, and minCount only drops rare words from the model. */
class NaiveBayesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "hund katze hund maus", "de"),
    (2L, "hund hund vogel", "de"),
    (3L, "dog cat dog mouse", "en"),
    (4L, "dog dog bird", "en"),
    (5L, "dog hund cat", "en"))

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** In-memory NB with the operator's exact rounding discipline. */
  private def score(train: Seq[(Long, String, String)],
      text: String, c: String): BigDecimal = {
    val toks = train.flatMap(d => d._2.split(" ").map((d._3, _)))
    val vocab = toks.map(_._2).distinct.size
    val byC = toks.filter(_._1 == c)
    val nTok = byC.size
    val nDocsC = train.count(_._3 == c)
    def dec(x: Double): BigDecimal =
      BigDecimal(r6(x)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val prior = dec(math.log(nDocsC.toDouble / train.size))
    val l0 = dec(math.log(1.0 / (nTok + vocab)))
    val counts = byC.groupBy(_._2).view.mapValues(_.size).toMap
    text.split(" ").foldLeft(prior) { (acc, w) =>
      acc + counts.get(w).fold(l0)(n =>
        dec(math.log((n + 1.0) / (nTok + vocab))))
    }
  }

  test("scores equal the in-memory model; separable classes classify perfectly") {
    val df = docs.toDF("doc_id", "text", "lang")
    val got = NaiveBayes.classify(df, df)
      .orderBy("doc_id")
      .as[(Long, String, String, Double)].collect()
    for ((id, lang, pred, s) <- got) {
      val text = docs.find(_._1 == id).get._2
      // argmax with smaller-label tie-break
      val best = Seq("de", "en").map(c => (c, score(docs, text, c)))
        .sortBy { case (c, v) => (-v, c) }.head
      assert(pred === best._1, s"doc $id")
      assert(s === best._2.toDouble, s"doc $id score")
      assert(lang === docs.find(_._1 == id).get._3)
    }
    // docs 1-4 are vocabulary-separable; doc 5 leans en (2 of 3 words)
    assert(got.map(g => g._1 -> g._3).toMap ===
      Map(1L -> "de", 2L -> "de", 3L -> "en", 4L -> "en", 5L -> "en"))
  }

  test("minCount caps the model; capped words fall to the zero-count floor") {
    val df = docs.toDF("doc_id", "text", "lang")
    // minCount=2 keeps only words seen >=2x per class (hund/dog);
    // every other word scores as unseen — still separable here
    val got = NaiveBayes.classify(df, df, minCount = 2L)
      .orderBy("doc_id").as[(Long, String, String, Double)].collect()
    assert(got.map(g => g._1 -> g._3).toMap ===
      Map(1L -> "de", 2L -> "de", 3L -> "en", 4L -> "en", 5L -> "en"))
    // capped scores differ from uncapped (the model really shrank)
    val full = NaiveBayes.classify(df, df)
      .orderBy("doc_id").as[(Long, String, String, Double)].collect()
    assert(got.map(_._4).toSeq !== full.map(_._4).toSeq)
  }

  test("class summary carries exact totals") {
    val df = docs.toDF("doc_id", "text", "lang")
    val got = NaiveBayes.classSummary(df).orderBy("lang")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.map(g => (g._1, g._2, g._3)).toSeq ===
      Seq(("de", 2L, 7L), ("en", 3L, 10L)))
    // prior/l0 surface as floor-scaled e6 integers (never engine-
    // ROUNDed doubles)
    def e6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    val vocab = docs.flatMap(_._2.split(" ")).distinct.size
    assert(got.find(_._1 == "de").get._5 === e6(math.log(1.0 / (7 + vocab))))
    assert(got.find(_._1 == "de").get._4 === e6(math.log(2.0 / 5)))
  }
}
