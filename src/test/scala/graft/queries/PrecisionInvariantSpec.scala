package graft.queries

import graft.TestSpark
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The precision-invariant queries (q_minhash_lsh, q_simhash,
  * q_ann_lsh, q_ann_ivf, q_embed_neardup_lsh) pass by returning an
  * EMPTY violations relation — this spec proves the checks are not
  * vacuous: the underlying operators really produce candidates on the
  * fixture, and the shared ANN harness fires on doctored results.
  */
class PrecisionInvariantSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private def q(name: String) =
    Pipeline.all.find(_.name == name).getOrElse(fail(s"query missing: $name"))

  test("violation queries are empty BECAUSE the invariant holds, not because nothing ran") {
    val docs = graft.Tables.load(spark, sf, "documents")
    val emb = graft.Tables.load(spark, sf, "embeddings")
    // the operators under test produce real, non-trivial candidates
    assert(Dedup.minHashCandidates(docs.where(col("doc_id") < 300), 16, 4)
      .count() > 100)
    assert(Dedup.simHashPairs(docs.where(col("doc_id") < 150), 10).count() > 100)
    assert(Similarity.lshTopK(emb.where(col("vec_id") < 10), emb, 5, 8)
      .count() > 0)
    assert(Dedup.cosineNearDupPairs(emb, 0.3, lshBits = 6).count() > 0)
    // and on the same fixture every violation relation is empty
    for (name <- Seq("q_minhash_lsh", "q_simhash", "q_ann_lsh", "q_ann_ivf",
        "q_embed_neardup_lsh"))
      assert(q(name).run(spark, sf).count() === 0L, s"$name flagged violations")
  }

  test("the ANN precision harness fires on doctored results") {
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val qs = emb.where(col("vec_id") < 10)
    val good = Similarity.lshTopK(qs, emb, 5, 8)
    // a mis-scored neighbor: bump one sim so it no longer matches the
    // exact cosine -> flagged as fabricated_or_misscored
    val misscored = good.withColumn("sim_e5",
      when(col("rank") === 1, col("sim_e5") + 50000L).otherwise(col("sim_e5")))
    val flagged = Pipeline.annPrecisionViolations(qs, emb, misscored, 5).collect()
    assert(flagged.nonEmpty && flagged.forall(
      _.getString(0) == "fabricated_or_misscored"))
    // a broken ranking: reverse the rank order -> rank_shape violations
    val reranked = good.withColumn("rank", lit(6) - col("rank"))
    val shape = Pipeline.annPrecisionViolations(qs, emb, reranked, 5).collect()
    assert(shape.exists(_.getString(0) == "rank_shape"))
  }
}
