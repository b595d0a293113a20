package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Chunking invariants, property-checked over random (docLen,
  * chunkTokens, overlap) shapes: full coverage, correct stepping, and
  * — the round-8 fix — no chunk whose tokens are wholly contained in
  * its predecessor (a tail start landing within `overlap` of the end
  * used to emit one, duplicating training tokens).
  */
class TextChunkingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def chunksOf(len: Int, chunkTokens: Int, overlap: Int): Seq[(Long, Seq[String])] = {
    import spark.implicits._
    val text = (0 until len).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    TextChunking.chunk(df, col("text"), chunkTokens, overlap)
      .select("chunk_id", "chunk")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq))
      .sortBy(_._1)
  }

  test("properties: coverage, stepping, and no fully-contained chunk") {
    val gen = for {
      chunk <- Gen.choose(2, 12)
      overlap <- Gen.choose(0, chunk - 1)
      len <- Gen.choose(1, 40)
    } yield (len, chunk, overlap)
    val p = Prop.forAll(gen) { case (len, chunkTokens, overlap) =>
      val cs = chunksOf(len, chunkTokens, overlap)
      val step = chunkTokens - overlap
      // chunk ids are 0..n-1 and each chunk holds the right slice
      val idsOk = cs.map(_._1) == cs.indices.map(_.toLong)
      val slicesOk = cs.forall { case (id, toks) =>
        val start = id.toInt * step
        toks == (start until math.min(len, start + chunkTokens)).map(i => s"t$i")
      }
      // every token is covered — the tail bound must not DROP tokens
      val coverageOk = cs.flatMap(_._2).distinct.size == len
      // no chunk is a subset of its predecessor's tokens
      val noContained = cs.sliding(2).forall {
        case Seq((_, prev), (_, cur)) => !cur.forall(prev.toSet)
        case _ => true
      }
      idsOk && slicesOk && coverageOk && noContained
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), p)
    assert(res.passed, res.status.toString)
  }

  test("a doc shorter than one chunk yields exactly one whole chunk") {
    assert(chunksOf(3, 8, 2) === Seq((0L, Seq("t0", "t1", "t2"))))
    assert(chunksOf(1, 4, 0) === Seq((0L, Seq("t0"))))
  }

  test("the old contained-tail shape: len within overlap of a start emits no extra chunk") {
    // len=10, chunk=8, overlap=4 -> step 4; starts 0 and 4 cover all 10
    // tokens; the old bound also emitted start 8, whose tokens {t8,t9}
    // are wholly inside chunk 1 (t4..t9)
    val cs = chunksOf(10, 8, 4)
    assert(cs.size === 2)
    assert(cs(1)._2 === (4 until 10).map(i => s"t$i"))
  }
}
