package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** BPE learn + encode against the hand-computed Sennrich-style
  * fixture, plus the structural contracts (no cross-word merges, pure
  * scan-stage encode plan). */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // word frequencies: low x3, lower x2, new x1
  private def tiny = Seq(
    (1L, "low low lower"),
    (2L, "low lower new")
  ).toDF("doc_id", "text")

  test("learn picks the most frequent pair each round, merging as it goes") {
    // round 1 pairs (weighted): "l o" 5, "o w" 5, "w </w>" 3,
    // "w e" 2, "e r" 2, "r </w>" 2, "n e" 1, "e w" 1, "w </w>"...
    // top = "l o" (count 5, ties broken pair-ASC: "l o" < "o w")
    val merges = Bpe.learn(tiny, 3)
    assert(merges.head === ("l", "o"))
    // round 2: "lo w" 5 wins (others <= 3)
    assert(merges(1) === ("lo", "w"))
    // round 3: "low </w>" 3 wins over "e r" 2 / "low e" 2
    assert(merges(2) === ("low", "</w>"))
  }

  test("encode applies merges in rank order; tokens match by hand") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("low", "</w>"))
    val enc = Bpe.encode(tiny, merges).orderBy("doc_id")
      .select("tokens").as[Seq[String]].collect()
    // "low" -> [low</w>]; "lower" -> [low, e, r, </w>]; "new" -> chars
    assert(enc(0) === Seq("low</w>", "low</w>", "low", "e", "r", "</w>"))
    assert(enc(1) === Seq("low</w>", "low", "e", "r", "</w>",
      "n", "e", "w", "</w>"))
  }

  test("merges never apply across a word boundary") {
    // learned pair (w, n) would be needed to merge "...w </w> n..." —
    // but </w> sits between, so even an adversarial merge list cannot
    // bridge words
    val docs = Seq((1L, "ow new")).toDF("doc_id", "text")
    val enc = Bpe.encode(docs, Seq(("w", "n"))).select("tokens")
      .as[Seq[String]].collect().head
    assert(enc === Seq("o", "w", "</w>", "n", "e", "w", "</w>"))
  }

  test("encode of empty and whitespace-only docs yields zero tokens") {
    val docs = Seq((1L, ""), (2L, " "), (3L, "a")).toDF("doc_id", "text")
    val enc = Bpe.encode(docs, Seq(("a", "</w>"))).orderBy("doc_id")
      .select("tokens").as[Seq[String]].collect()
    assert(enc(0) === Seq.empty)
    assert(enc(1) === Seq.empty)
    assert(enc(2) === Seq("a</w>"))
  }

  test("learn stops early when no pairs remain") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    // each word is one char + </w>: exactly 2 mergeable pairs exist
    val merges = Bpe.learn(docs, 10)
    assert(merges.length === 2)
    val enc = Bpe.encode(docs, merges).select("n_tokens")
      .as[Long].collect().head
    assert(enc === 2L) // every word one fused symbol
  }

  test("encode is pure scan-stage: no exchange, no UDF in the plan") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val merges = Seq(("e", "r"), ("t", "h"), ("th", "e</w>"))
    val plan = Bpe.encode(docs, merges)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }

  test("learned merges are deterministic across runs") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val a = Bpe.learn(docs, 5)
    val b = Bpe.learn(docs, 5)
    assert(a === b)
    assert(a.length === 5)
  }
}
