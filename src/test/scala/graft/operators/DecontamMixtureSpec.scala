package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Decontamination and mixture sampling vs independent in-memory
  * reference computations on constructed corpora. */
class DecontamMixtureSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** In-memory shingle set mirroring Dedup.shingleSet. */
  private def shingles(text: String, n: Int): Set[String] = {
    val w = text.split(" ", -1)
    if (w.length < n) Set.empty
    else w.sliding(n).map(_.mkString("_")).toSet
  }

  test("overlap counts exactly the shingles shared with the eval set") {
    val eval = Seq(100L -> "the quick brown fox jumps over the lazy dog")
    val train = Seq(
      1L -> "the quick brown fox jumps over the lazy dog", // verbatim copy
      2L -> "a quick brown fox appears in this sentence here", // partial
      3L -> "completely unrelated words with zero benchmark content")
    val got = Decontam.overlap(docsDf(train), docsDf(eval), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val evalSh = shingles(eval.head._2, 3)
    val want = train
      .map { case (id, t) => id -> (shingles(t, 3) & evalSh).size.toLong }
      .filter(_._2 > 0).toMap
    assert(got === want)
    // the verbatim copy collides on its full shingle set
    assert(got(1L) === shingles(train.head._2, 3).size.toLong)
    assert(!got.contains(3L))
  }

  test("contaminatedSpans masks exactly the eval-covered windows, merged") {
    import spark.implicits._
    val eval = Seq(100L -> "q r s")
    // doc1: "q r s" at pos 2 and pos 6 (n=3) -> spans [2,5) and [6,9);
    // doc2: no eval 3-gram at all -> absent
    val train = Seq(
      1L -> "z q r s w q r s k",
      2L -> "a b c d e f")
    val spans = Decontam.contaminatedSpans(docsDf(train), docsDf(eval), 3)
      .orderBy("doc_id", "span_start").as[(Long, Long, Long)].collect()
    assert(spans === Array((1L, 2L, 5L), (1L, 6L, 9L)))
    // a verbatim eval copy masks wall-to-wall: one whole-doc span
    val copy = Seq(1L -> "q r s")
    val whole = Decontam.contaminatedSpans(docsDf(copy), docsDf(eval), 3)
      .as[(Long, Long, Long)].collect()
    assert(whole === Array((1L, 1L, 4L)))
  }

  test("clean removes exactly the documents at or over the threshold") {
    val eval = Seq(100L -> "alpha beta gamma delta epsilon zeta eta theta")
    val train = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta", // 6 hits
      2L -> "alpha beta gamma then something else entirely follows", // 1 hit
      3L -> "nothing shared at all in this one document")
    val kept = Decontam.clean(docsDf(train), docsDf(eval), 3, maxOverlap = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L))
    // threshold 1: any collision at all contaminates
    val strict = Decontam.clean(docsDf(train), docsDf(eval), 3, maxOverlap = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(strict === Set(3L))
  }

  private def corpus(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, s"src${i % 4}", 10L + i % 7)
    }.toDF("doc_id", "source", "n_tok")
  }

  test("mixture sampling matches the closed-form keep predicate") {
    val docs = corpus(400)
    val weights = Map("src0" -> 500, "src1" -> 200)
    val budget = 2000L
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val avail = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val tgt = (s: String) => budget * weights.getOrElse(s, 50).toLong / 1000L
    val want = rows.filter { case (id, s, _) =>
      math.floorMod(id * 2654435761L, 1000L) * avail(s) <
        math.min(avail(s), tgt(s)) * 1000L
    }.map(_._1).toSet
    val got = Mixture.sample(docs, "source", org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("n_tok"),
        weights, defaultPermille = 50, budget = budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === want)
    // determinism: a second run is bit-identical
    val again = Mixture.sample(docs, "source", org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("n_tok"),
        weights, defaultPermille = 50, budget = budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === got)
  }

  test("mixture edge rates: full budget keeps everything, zero keeps nothing") {
    val docs = corpus(100)
    import org.apache.spark.sql.functions.col
    val all = Mixture.sample(docs, "source", col("doc_id"), col("n_tok"),
      Map.empty, defaultPermille = 1000, budget = 1000000L)
    assert(all.count() === 100)
    val none = Mixture.sample(docs, "source", col("doc_id"), col("n_tok"),
      Map.empty, defaultPermille = 0, budget = 1000000L)
    assert(none.count() === 0)
  }

  test("upsample: integer weights repeat exactly; fractional match the closed form") {
    val docs = corpus(200)
    import org.apache.spark.sql.functions.{col, lit}
    // w = 1000 per-mille: exactly one epoch per row, epochs all 1
    val once = Mixture.upsample(docs, col("doc_id"), lit(1000L))
    assert(once.count() === 200)
    assert(once.where(col("epoch") =!= 1L).count() === 0)
    // w = 3000: exactly three epochs 1..3 per row
    val thrice = Mixture.upsample(docs, col("doc_id"), lit(3000L))
    assert(thrice.count() === 600)
    assert(thrice.groupBy("doc_id").count().where(col("count") =!= 3L).count() === 0)
    // w = 2400: per-row copies equal the closed form floor + bucket test
    val frac = Mixture.upsample(docs, col("doc_id"), lit(2400L))
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- 0L until 200L) {
      val want = 2L + (if (math.floorMod(id * 2654435761L, 1000L) < 400L) 1L else 0L)
      assert(frac.getOrElse(id, 0L) === want, s"doc $id")
    }
    // w = 0 vanishes; null weight vanishes
    assert(Mixture.upsample(docs, col("doc_id"), lit(0L)).count() === 0)
    assert(Mixture.upsample(docs, col("doc_id"),
      lit(null).cast("long")).count() === 0)
  }

  test("temperature weights: alpha=1 matches proportions, alpha=0.5 flattens") {
    val docs = corpus(200)
    import org.apache.spark.sql.functions.col
    def weights(alpha: Double): Map[String, (Long, Double)] =
      Mixture.temperatureWeights(docs, "source", col("n_tok"), alpha)
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2) / 1e6))
        .toMap
    val w1 = weights(1.0)
    val tot = w1.values.map(_._1).sum.toDouble
    for ((_, (n, w)) <- w1)
      assert(math.abs(w - n / tot) < 2e-6, s"alpha=1 should be proportional")
    val wHalf = weights(0.5)
    assert(math.abs(wHalf.values.map(_._2).sum - 1.0) < 1e-4)
    // flattening: the largest domain's share shrinks vs alpha=1, the
    // smallest domain's share grows
    val bigSrc = w1.maxBy(_._2._1)._1
    val smallSrc = w1.minBy(_._2._1)._1
    if (w1(bigSrc)._1 != w1(smallSrc)._1) {
      assert(wHalf(bigSrc)._2 < w1(bigSrc)._2)
      assert(wHalf(smallSrc)._2 > w1(smallSrc)._2)
    }
    // composed sampling is deterministic and respects the caps
    val s1 = Mixture.temperatureSample(docs, "source", col("doc_id"),
      col("n_tok"), 0.5, budget = 2000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Mixture.temperatureSample(docs, "source", col("doc_id"),
      col("n_tok"), 0.5, budget = 2000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 === s2)
    assert(s1.nonEmpty && s1.size < 200)
  }
}
