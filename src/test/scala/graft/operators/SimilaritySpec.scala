package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** IVF ANN invariants over the sf0.001 embeddings fixture. */
class SimilaritySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("native cosine expression is bit-identical to the composed form") {
    import org.apache.spark.sql.functions.col
    val e = emb.limit(200)
    val pairs = e.select(col("vec_id").as("a"), col("embedding").as("ea"))
      .crossJoin(e.select(col("vec_id").as("b"), col("embedding").as("eb")))
      .where(col("a") < col("b"))
    // raw doubles, unrounded: any bit of divergence fails
    val diff = pairs.select(
      Similarity.cosine(col("ea"), col("eb")).as("native"),
      Similarity.cosineComposed(col("ea"), col("eb")).as("composed"))
      .where(col("native") =!= col("composed"))
      .count()
    assert(diff === 0)
  }

  test("ivf with nprobe = nlist equals exact brute force") {
    import org.apache.spark.sql.functions.col
    val q = emb.where(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(q, emb, 5)
    val ivf = Similarity.ivfTopK(q, emb, 5, nlist = 8, nprobe = 8)
    assert(brute.exceptAll(ivf).count() === 0)
    assert(ivf.exceptAll(brute).count() === 0)
    assert(ivf.count() === 25) // 5 queries x top-5
  }

  test("partial probing returns a deterministic subset with exact scores") {
    import org.apache.spark.sql.functions.col
    val q = emb.where(col("vec_id") < 5)
    val ivf1 = Similarity.ivfTopK(q, emb, 5, nlist = 8, nprobe = 2)
    val ivf2 = Similarity.ivfTopK(q, emb, 5, nlist = 8, nprobe = 2)
    // deterministic across runs (no model, no randomness)
    assert(ivf1.exceptAll(ivf2).count() === 0)
    // every returned (qid, cid, sim) carries the same exact score brute
    // force computes for that pair — probing prunes candidates, never
    // changes scores
    val brute = Similarity.bruteForceTopK(q, emb, Int.MaxValue)
      .select("qid", "cid", "sim")
    assert(ivf1.select("qid", "cid", "sim").exceptAll(brute).count() === 0)
  }
}
