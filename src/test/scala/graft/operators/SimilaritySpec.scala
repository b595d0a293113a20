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
    // raw doubles, unrounded; null-safe inequality so a null-vs-value
    // divergence can't hide behind three-valued logic
    val diff = pairs.select(
      Similarity.cosine(col("ea"), col("eb")).as("native"),
      Similarity.cosineComposed(col("ea"), col("eb")).as("composed"))
      .where(!(col("native") <=> col("composed")))
      .count()
    assert(diff === 0)
  }

  test("native cosine matches composed nulling on mismatched lengths and doubles") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)), // length mismatch -> null
      (Array(1.0f, 2.0f), Array(2.0f, 1.0f))
    ).toDF("a", "b")
    val got = df.select(
      Similarity.cosine(col("a"), col("b")).as("native"),
      Similarity.cosineComposed(col("a"), col("b")).as("composed"))
    assert(got.where(!(col("native") <=> col("composed"))).count() === 0)
    assert(got.where(col("native").isNull).count() === 1)
    // double-element arrays are accepted and exact
    val d = Seq((Array(1.0, 0.0), Array(1.0, 0.0))).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("s")).collect()
    assert(d.head.getDouble(0) === 1.0)
  }

  test("lsh buckets are deterministic and identical vectors always collide") {
    import org.apache.spark.sql.functions.col
    val b1 = emb.select(col("vec_id"), Similarity.lshBucket(col("embedding"), 8).as("b"))
    val b2 = emb.select(col("vec_id"), Similarity.lshBucket(col("embedding"), 8).as("b"))
    // deterministic across evaluations
    assert(b1.exceptAll(b2).count() === 0)
    // bucket ids stay inside the declared bit width
    import org.apache.spark.sql.functions.{max, min}
    val r = b1.agg(min("b"), max("b")).collect().head
    assert(r.getLong(0) >= 0L && r.getLong(1) < (1L << 8))
    // identical vectors on DIFFERENT rows collide (the LSH recall
    // anchor): duplicate every embedding under a shifted id and check
    // each twin pair shares a bucket
    import org.apache.spark.sql.functions.expr
    val twins = emb.select(col("vec_id"), col("embedding"))
      .unionByName(emb.select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      .select(col("vec_id"), Similarity.lshBucket(col("embedding"), 8).as("b"))
    val pairs = twins.as("o").join(twins.as("t"),
      expr("t.vec_id = o.vec_id + 100000"))
    assert(pairs.count() > 0)
    assert(pairs.where(col("o.b") =!= col("t.b")).count() === 0)
    // degenerate vectors (empty / null element) bucket as null
    import spark.implicits._
    val deg = Seq(Array.empty[Float], Array(1.0f)).toDF("embedding")
    val degB = deg.select(Similarity.lshBucket(col("embedding"), 8).as("b")).collect()
    assert(degB.count(_.isNullAt(0)) === 1)
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
      .select("qid", "cid", "sim_e5")
    assert(ivf1.select("qid", "cid", "sim_e5").exceptAll(brute).count() === 0)
  }

  test("kmeans partitions the corpus deterministically; k = N is the identity fixed point") {
    import org.apache.spark.sql.functions._
    val n = emb.count()
    // production shape: every vector assigned exactly once to a seed id
    val res = Similarity.kmeans(emb, k = 8, iters = 2)
    assert(res.count() === n)
    assert(res.select("vec_id").distinct().count() === n)
    val seeds = emb.orderBy("vec_id").limit(8)
      .select(col("vec_id").as("cluster"))
    assert(res.join(seeds, Seq("cluster"), "left_anti").count() === 0)
    assert(res.select("cluster").distinct().count() > 1)
    // deterministic across runs (fixed seeds, fixed iters, tie-break)
    val res2 = Similarity.kmeans(emb, k = 8, iters = 2)
    assert(res.exceptAll(res2).count() === 0)
    // iterating actually moves assignments off the raw seed Voronoi
    // for at least some corpus shapes is not guaranteed — but the
    // k = N fixed point is: every point clusters to itself (or the
    // lowest id of an exact-duplicate group)
    val full = Similarity.kmeans(emb, k = n.toInt, iters = 1)
    val own = emb.select(col("vec_id"),
      min("vec_id").over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("embedding"))).as("expect"))
    assert(full.join(own, "vec_id")
      .where(col("cluster") =!= col("expect")).count() === 0)
  }

  test("NearestCentroid equals the join-product argmax it replaced") {
    import org.apache.spark.sql.functions._
    // the old assignment shape: cross-join every point with every
    // centroid, max_by(struct(cosine, -label)) — kept here as the
    // independent reference; the expression must agree on every point
    // of the fixture for an arbitrary centroid model (first 7 vectors)
    val model = emb.orderBy("vec_id").limit(7)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toSeq
    val cents = emb.orderBy("vec_id").limit(7)
      .select(col("vec_id").as("cid"),
        transform(col("embedding"), _.cast("double")).as("cent"))
    val ref = emb.select(col("vec_id").as("pid"), col("embedding").as("pv"))
      .crossJoin(broadcast(cents))
      .groupBy("pid")
      .agg(max_by(col("cid"),
        struct(Similarity.cosine(col("pv"), col("cent")).as("s"),
          (-col("cid")).as("tie"))).as("expect"))
    val got = emb.select(col("vec_id").as("pid"),
      graft.functions.NearestCentroid(col("embedding"), model).as("cluster"))
    assert(got.join(ref, "pid")
      .where(!(col("cluster") <=> col("expect"))).count() === 0)
    // per-key variant: split the model across two keys and key each
    // point by parity — each point must argmax within ITS key's half
    val byKey: Map[Long, Seq[(Long, Array[Double])]] =
      Map(0L -> model.take(4), 1L -> model.drop(4))
    val refIn = emb.select(col("vec_id").as("pid"), col("embedding").as("pv"),
        (col("vec_id") % 2).as("key"))
      .crossJoin(broadcast(cents))
      .where((col("key") === 0 && col("cid") < model(4)._1) ||
        (col("key") === 1 && col("cid") >= model(4)._1))
      .groupBy("pid")
      .agg(max_by(col("cid"),
        struct(Similarity.cosine(col("pv"), col("cent")).as("s"),
          (-col("cid")).as("tie"))).as("expect"))
    val gotIn = emb.select(col("vec_id").as("pid"),
      graft.functions.NearestCentroidIn(col("vec_id") % 2,
        col("embedding"), byKey).as("cluster"))
    assert(gotIn.join(refIn, "pid")
      .where(!(col("cluster") <=> col("expect"))).count() === 0)
    // a key with no centroids yields null, not an error
    val gotNone = emb.select(graft.functions.NearestCentroidIn(
      lit(7L), col("embedding"), byKey).as("c"))
    assert(gotNone.where(col("c").isNotNull).count() === 0)
  }

  test("two-level kmeans is a total deterministic partition with in-cell labels") {
    import org.apache.spark.sql.functions._
    val n = emb.count()
    val res = Similarity.kmeansTwoLevel(emb, k = 9, iters = 2)
      .localCheckpoint()
    // total: every vector assigned exactly once
    assert(res.count() === n)
    assert(res.select("vec_id").distinct().count() === n)
    // labels are real corpus vec_ids (fine seeds)
    assert(res.join(emb.select(col("vec_id").as("cluster")),
      Seq("cluster"), "left_anti").count() === 0)
    assert(res.select("cluster").distinct().count() > 1)
    // every point's label belongs to its OWN coarse cell: the fine
    // assignment never crosses the frozen coarse partition
    val kc = 3 // ceil(sqrt(9))
    val coarse = Similarity.kmeans(emb, k = kc, iters = 2)
      .withColumnRenamed("cluster", "cell")
    val ptCell = res.join(coarse, "vec_id")
    val seedCell = coarse.select(col("vec_id").as("cluster"),
      col("cell").as("__seedCell"))
    assert(ptCell.join(seedCell, "cluster")
      .where(col("cell") =!= col("__seedCell")).count() === 0)
    // deterministic across runs
    val res2 = Similarity.kmeansTwoLevel(emb, k = 9, iters = 2)
    assert(res.exceptAll(res2).count() === 0)
    // degenerate k: falls back to flat kmeans shapes without error
    assert(Similarity.kmeansTwoLevel(emb, k = 1, iters = 1)
      .select("cluster").distinct().count() === 1)
  }

  test("kmeansTree at depth 2 is bit-identical to kmeansTwoLevel") {
    import org.apache.spark.sql.functions._
    // k = 9, branch = 8 -> depth 2, fan = 3; kmeansTwoLevel's
    // kc = ceil(sqrt(9)) = 3, kf = 3 — identical arithmetic, so the
    // tree must reproduce the two-level assignment exactly
    val tree = Similarity.kmeansTree(emb, k = 9, iters = 2, branch = 8)
    val two = Similarity.kmeansTwoLevel(emb, k = 9, iters = 2)
    assert(tree.exceptAll(two).count() === 0)
    assert(two.exceptAll(tree).count() === 0)
    // depth 1 (k <= branch) IS flat kmeans
    val d1 = Similarity.kmeansTree(emb, k = 8, iters = 1, branch = 16)
    val flat = Similarity.kmeans(emb, k = 8, iters = 1)
    assert(d1.exceptAll(flat).count() === 0)
  }

  test("kmeansTree at depth 3 is a total deterministic partition under the frozen root") {
    import org.apache.spark.sql.functions._
    val n = emb.count()
    // k = 8, branch = 2 -> a genuine depth-3 tree (fan = 2)
    val res = Similarity.kmeansTree(emb, k = 8, iters = 2, branch = 2)
      .localCheckpoint()
    assert(res.count() === n)
    assert(res.select("vec_id").distinct().count() === n)
    assert(res.join(emb.select(col("vec_id").as("cluster")),
      Seq("cluster"), "left_anti").count() === 0)
    assert(res.select("cluster").distinct().count() > 1)
    // the root partition is frozen: a leaf label lives in the same
    // level-1 cell as the vector it labels (level 1 == flat kmeans at
    // k = fan = 2, re-derived independently)
    val coarse = Similarity.kmeans(emb, k = 2, iters = 2)
      .withColumnRenamed("cluster", "cell")
    val seedCell = coarse.select(col("vec_id").as("cluster"),
      col("cell").as("__seedCell"))
    assert(res.join(coarse, "vec_id").join(seedCell, "cluster")
      .where(col("cell") =!= col("__seedCell")).count() === 0)
    // deterministic across runs
    val res2 = Similarity.kmeansTree(emb, k = 8, iters = 2, branch = 2)
    assert(res.exceptAll(res2).count() === 0)
  }

  test("kmeansAuto dispatches flat under the kernel budget, tree above it") {
    // the spec-pinned boundary: flat needs k <= 65536 AND
    // n * k <= FlatKernelBudget
    val b = Similarity.FlatKernelBudget
    assert(Similarity.kmeansPlanFor(1000L, 16) === "flat")
    assert(Similarity.kmeansPlanFor(b / 16, 16) === "flat")
    assert(Similarity.kmeansPlanFor(b / 16 + 1, 16) === "tree")
    assert(Similarity.kmeansPlanFor(2_000_000L, 4000) === "tree")
    // above flat's driver-model cap the tree takes over at ANY n —
    // the SemDedup default path can size k with the corpus without
    // tripping flat's require (the r17 advice finding)
    assert(Similarity.kmeansPlanFor(10L, 65537) === "tree")
    // end-to-end: the fixture sits under the budget, so auto == flat
    val auto = Similarity.kmeansAuto(emb, k = 8, iters = 1)
    val flat = Similarity.kmeans(emb, k = 8, iters = 1)
    assert(auto.exceptAll(flat).count() === 0)
    // and a k past the flat cap still runs (routed to the tree):
    // total partition over the tiny fixture, no require failure
    val big = Similarity.kmeansAuto(emb, k = 70000, iters = 0)
    assert(big.count() === emb.count())
  }

  test("degenerate point vectors get a null cluster, clean rows still partition") {
    // the output contract the kmeans scaladoc states (r17 advice):
    // a null-element or length-mismatched vector has no well-defined
    // cosine to any centroid -> NULL cluster; clean rows are
    // unaffected. Seeds here are the two lowest ids (clean rows 1, 2).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rag = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.9f, 0.1f)),
      (4L, Array(1.0f, 2.0f, 3.0f)), // ragged: no length-2 centroid
      (5L, null.asInstanceOf[Array[Float]])
    ).toDF("vec_id", "embedding")
      .withColumn("embedding",
        when(col("vec_id") === 5L,
          array(lit(1.0f), lit(null).cast("float")))
          .otherwise(col("embedding")))
    val res = Similarity.kmeans(rag, k = 2, iters = 1)
    val got = res.orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got(1L) === Some(1L) && got(2L) === Some(2L))
    assert(got(3L) === Some(1L)) // nearest to (1,0)
    assert(got(4L) === None && got(5L) === None)
    // the tree honors the same contract through its chain
    val tres = Similarity.kmeansTree(rag, k = 2, iters = 1, branch = 2)
    assert(tres.where(col("vec_id").isin(4L, 5L))
      .where(col("cluster").isNotNull).count() === 0)
  }
}
