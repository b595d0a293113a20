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

  test("maxClusterSize re-splits a skewed assignment until no cluster exceeds the cap") {
    // one centroid owns 90% of the corpus: 45 vectors on a 45-degree
    // arc plus 5 far away — the pairwise stage would see a 45^2-pair
    // hot key without the cap
    def at(deg: Double) = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val emb = ((0 until 45).map(i => (i.toLong, at(i.toDouble))) ++
      (45 until 50).map(i => (i.toLong, at(160.0 + 4 * (i - 45)))))
      .toDF("vec_id", "embedding")
    val cap = 10
    val assign0 = Similarity.kmeans(emb, 2, 2).localCheckpoint()
    val assign = SemDedup.resplitOversized(emb, assign0, cap, 2)
    val sizes = assign.groupBy("cluster").count().collect().map(_.getLong(1))
    // per-key candidate-pair work is bounded by cap^2
    assert(sizes.max <= cap, s"sizes ${sizes.toSeq.sorted}")
    assert(sizes.sum === 50)
    // every vector keeps exactly one label
    assert(assign.select("vec_id").distinct().count() === 50)
    // deterministic: a second run produces the identical assignment
    val again = SemDedup.resplitOversized(emb,
      Similarity.kmeans(emb, 2, 2).localCheckpoint(), cap, 2)
    assert(assign.orderBy("vec_id").collect() ===
      again.orderBy("vec_id").collect())
  }

  test("capped dedup applies the same drop rule within the re-split clusters") {
    import org.apache.spark.sql.functions.{col, broadcast}
    def at(deg: Double) = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val emb = (0 until 40).map(i => (i.toLong, at(i * 2.0)))
      .toDF("vec_id", "embedding").localCheckpoint()
    val cap = 8
    val surv = SemDedup.dedup(emb, k = 2, iters = 2, minCos = 0.995,
      maxClusterSize = Some(cap)).orderBy("vec_id").as[(Long, Long)].collect()
    // independent re-derivation from the deterministic re-split
    val assign = SemDedup.resplitOversized(emb,
      Similarity.kmeans(emb, 2, 2).localCheckpoint(), cap, 2)
    val m = emb.join(broadcast(assign), "vec_id")
    val dropped = SemDedup.candidateDrops(m, 0.995)
      .collect().map(_.getLong(0)).toSet
    val expect = assign.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filterNot(p => dropped.contains(p._1))
    assert(surv === expect)
    // and a drop needs a lower-id clustermate: survivors' minimum per
    // final cluster is always kept
    val keptPerCluster = expect.groupBy(_._2).view.mapValues(_.map(_._1).min)
    for ((c, lo) <- keptPerCluster)
      assert(surv.exists(p => p._1 == lo && p._2 == c))
  }

  test("an unsplittable identical-vector mass terminates and still dedups") {
    val emb = (0 until 30).map(i => (i.toLong, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    // identical vectors give k-means nothing to separate: the bounded
    // re-split depth must terminate, and the drop rule then keeps only
    // the lowest id
    val surv = SemDedup.dedup(emb, k = 2, iters = 1, minCos = 0.99,
      maxClusterSize = Some(5)).as[(Long, Long)].collect()
    assert(surv.map(_._1).toSeq === Seq(0L))
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
