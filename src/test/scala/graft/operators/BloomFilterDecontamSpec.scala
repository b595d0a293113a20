package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BloomFilterDecontam vs an independent in-memory reference: md5
  * double hashing recomputed with java.security.MessageDigest, the
  * filter rebuilt bit by bit, membership checked per shingle. */
class BloomFilterDecontamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** In-memory mirror of the operator's position derivation. */
  private def refPositions(s: String, mBits: Int, k: Int): Seq[Long] = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h1 = java.lang.Long.parseLong(hex.substring(0, 8), 16)
    val h2 = java.lang.Long.parseLong(hex.substring(8, 16), 16) | 1L
    (0 until k).map(i => (h1 + i.toLong * h2) % mBits)
  }

  private def refFilter(items: Seq[String], mBits: Int, k: Int): Array[Long] = {
    val arr = new Array[Long](BloomFilterDecontam.numWords(mBits))
    for (s <- items; p <- refPositions(s, mBits, k)) {
      val w = (p / BloomFilterDecontam.BitsPerWord).toInt
      arr(w) |= 1L << (p % BloomFilterDecontam.BitsPerWord).toInt
    }
    arr
  }

  private def refShingles(text: String, n: Int): Set[String] = {
    val w = text.split(" ", -1)
    if (w.length < n) Set.empty else w.sliding(n).map(_.mkString("_")).toSet
  }

  test("build packs exactly the reference bit pattern") {
    import spark.implicits._
    val items = Seq("alpha_beta_gamma", "delta_epsilon_zeta", "eta_theta_iota",
      "one_two_three", "x_y_z")
    val mBits = 62 * 8
    val got = BloomFilterDecontam.build(
      items.toDF("s"), col("s"), mBits, k = 3)
    assert(got.toSeq === refFilter(items, mBits, 3).toSeq)
  }

  test("mightContain: no false negatives; reference-exact membership") {
    import spark.implicits._
    val inSet = (1 to 40).map(i => s"member_$i")
    val outSet = (1 to 200).map(i => s"absent_$i")
    val mBits = 62 * 4 // deliberately tight so some false positives occur
    val words = BloomFilterDecontam.build(inSet.toDF("s"), col("s"), mBits, 2)
    val probe = (inSet ++ outSet).toDF("s")
      .withColumn("hit", BloomFilterDecontam.mightContain(words, mBits, 2)(col("s")))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // every inserted member hits (no false negatives, ever)
    assert(inSet.forall(probe))
    // membership equals the reference filter's bit test exactly,
    // false positives included
    val ref = refFilter(inSet, mBits, 2)
    for (s <- outSet) {
      val want = refPositions(s, mBits, 2).forall { p =>
        (ref((p / 62).toInt) >> (p % 62).toInt & 1L) == 1L
      }
      assert(probe(s) === want, s)
    }
    // the tight filter really does produce some false positives, so
    // the identical-FP claim above is not vacuous
    assert(outSet.exists(probe), "expected at least one false positive")
  }

  test("decontam: copies hit on all shingles, short docs report zeros") {
    val ref = Seq(100L -> "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")
    val train = Seq(
      1L -> "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", // verbatim
      2L -> "w5 w6 w7 w8 w9 w10 q1 q2 q3 q4", // partial overlap
      3L -> "too short", // < n words: no shingles
      4L -> "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10") // disjoint
    val got = BloomFilterDecontam
      .decontam(docsDf(train), docsDf(ref), n = 8, mBits = 62 * 16, k = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    val refSh = refShingles(ref.head._2, 8)
    val filt = refFilter(refSh.toSeq, 62 * 16, 3)
    for ((id, text) <- train) {
      val sh = refShingles(text, 8)
      val hits = sh.count(s => refPositions(s, 62 * 16, 3).forall(p =>
        (filt((p / 62).toInt) >> (p % 62).toInt & 1L) == 1L))
      assert(got(id) === ((sh.size.toLong, hits.toLong, hits > 0)), s"doc $id")
    }
    assert(got(1L)._3 && !got(3L)._3)
    assert(got(3L) === ((0L, 0L, false)))
  }

  test("random corpora: decontam equals the in-memory reference exactly") {
    val rnd = new scala.util.Random(42) // deterministic trials
    for (trial <- 1 to 3) {
      val vocab = (1 to 25).map(i => s"w$i") // dense: real shingle overlap
      def doc(): String =
        (1 to 2 + rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      val corpus = (1L to 60L).map(i => i -> doc())
      val ref = corpus.filter(_._1 % 7 == 0)
      val (n, mBits, k) = (3, 62 * 6, 2) // tight filter: FPs guaranteed
      val got = BloomFilterDecontam
        .decontam(docsDf(corpus), docsDf(ref), n, mBits, k)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
        .toMap
      val filt = refFilter(ref.flatMap(d => refShingles(d._2, n)).distinct, mBits, k)
      var fp = 0
      for ((id, text) <- corpus) {
        val sh = refShingles(text, n)
        val hits = sh.count(s => refPositions(s, mBits, k).forall(p =>
          (filt((p / 62).toInt) >> (p % 62).toInt & 1L) == 1L))
        assert(got(id) === ((sh.size.toLong, hits.toLong, hits > 0)),
          s"trial $trial doc $id")
        val truePos = refShingles(text, n)
          .count(s => ref.exists(d => refShingles(d._2, n).contains(s)))
        fp += hits - truePos
      }
      assert(fp > 0, s"trial $trial: tight filter should produce false positives")
    }
  }

  test("the probe plan never shuffles the corpus") {
    val docs = docsDf((1L to 50L).map(i =>
      i -> (1 to 12).map(j => s"t${i}_$j").mkString(" ")))
    val out = BloomFilterDecontam.decontam(
      docs, docs.where(col("doc_id") <= 3), n = 4, mBits = 62 * 16, k = 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
