package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance weighting vs an independent in-memory computation
  * of the same hashed-bucket log-likelihood ratio. */
class DsirSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }
  private def bucketOf(w: String): Int =
    "0123456789abcdef".indexOf(md5hex(w).charAt(0))

  test("logw matches an independent in-memory model, target-like docs rank up") {
    val target = Seq((100L, "alpha beta alpha gamma"))
    val raw = Seq(
      (1L, "alpha beta gamma alpha"), // target-ish vocabulary
      (2L, "delta epsilon zeta eta"), // disjoint vocabulary
      (3L, "alpha delta"))
    val got = Dsir.logWeights(raw.toDF("doc_id", "text"),
        target.toDF("doc_id", "text"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect()

    val k = 16
    val tc = Array.fill(k)(0L)
    target.flatMap(_._2.split(" ")).foreach(w => tc(bucketOf(w)) += 1)
    val rc = Array.fill(k)(0L)
    raw.flatMap(_._2.split(" ")).foreach(w => rc(bucketOf(w)) += 1)
    val (tn, rn) = (tc.sum, rc.sum)
    val lr = (0 until k).map(b =>
      math.log((tc(b) + 1.0) / (tn + k)) - math.log((rc(b) + 1.0) / (rn + k)))
    def want(text: String): Long = {
      val s = text.split(" ").map(w => lr(bucketOf(w))).sum
      math.floor(s * 1e6 + 0.5).toLong
    }
    assert(got.map(_._1) === Array(1L, 2L, 3L))
    for (((id, n, w), (rid, text)) <- got.zip(raw)) {
      assert(id === rid && n === text.split(" ").length.toLong)
      assert(w === want(text), s"doc $id")
    }
    // the vocabulary-sharing doc must outscore the disjoint one
    assert(got(0)._3 > got(1)._3)
  }

  test("select keeps the m best by (logw desc, doc_id asc)") {
    val target = Seq((100L, "x y z")).toDF("doc_id", "text")
    val raw = Seq((1L, "x y z"), (2L, "p q r"), (3L, "x y q"))
      .toDF("doc_id", "text")
    val sel = Dsir.select(raw, target, 2).select("doc_id")
      .as[Long].collect().toSet
    val all = Dsir.logWeights(raw, target)
      .orderBy(col("logw_e6").desc, col("doc_id"))
      .select("doc_id").as[Long].collect()
    assert(sel === all.take(2).toSet)
  }

  test("scoring is scan-stage: no join or exchange over the raw corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Dsir.logWeights(docs.where(col("doc_id") % 20 =!= 0),
        docs.where(col("doc_id") % 20 === 0))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"))
    assert(!plan.contains("Exchange"))
  }
}
