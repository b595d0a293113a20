package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup fixtures: per-cluster lowest-id-wins pruning and the
  * seen-semantics drop-chain contract. */
class SemDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("drops every vector with a lower-id clustermate over the threshold") {
    // seeds (2 lowest ids) split the plane; 2 echoes 0, 3 echoes 1
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.999f, 0.001f)),
      (3L, Array(0.0f, 2.0f))
    ).toDF("vec_id", "embedding")
    val surv = SemDedup.dedup(emb, k = 2, iters = 1, minCos = 0.95)
      .orderBy("vec_id").as[(Long, Long)].collect()
    assert(surv === Array((0L, 0L), (1L, 1L)))
  }

  test("seen semantics: a dropped vector still witnesses later drops") {
    // chain on the unit circle: 0 ~ 2 (18 deg) and 2 ~ 5 (18 deg) are
    // over cos(20 deg), 0 ~ 5 (36 deg) is under it — 5 must still
    // drop, witnessed by the already-dropped 2
    def at(deg: Double) = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val emb = Seq(
      (0L, at(0)), (2L, at(18)), (5L, at(36))
    ).toDF("vec_id", "embedding")
    val t = math.cos(math.toRadians(20))
    val surv = SemDedup.dedup(emb, k = 1, iters = 1, minCos = t)
      .orderBy("vec_id").as[(Long, Long)].collect()
    assert(surv.map(_._1) === Array(0L))
  }

  test("a threshold above every pairwise cosine keeps the whole corpus") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(60)
    val n = emb.count()
    val surv = SemDedup.dedup(emb, k = 4, iters = 1, minCos = 0.9999)
    assert(surv.count() === n)
  }

  test("a precomputed assignment yields the identical survivor set") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(80)
    val assign = Similarity.kmeans(emb, 4, 1)
    val a = SemDedup.dedup(emb, 4, 1, 0.4, Some(assign))
      .orderBy("vec_id").collect()
    val b = SemDedup.dedup(emb, 4, 1, 0.4, None)
      .orderBy("vec_id").collect()
    assert(a === b)
  }
}
