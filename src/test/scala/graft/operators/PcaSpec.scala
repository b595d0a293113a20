package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** PCA: covariance entries vs an in-memory computation with the same
  * rounding discipline, power-iteration components on a known 2-d
  * case, orthonormality, and variance ordering of projections. */
class PcaSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb(rows: Seq[(Long, Seq[Double])]) =
    rows.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")

  test("covariance equals the in-memory floor-scale computation") {
    val pts = Seq(
      1L -> Seq(1.0, 2.0, 0.5),
      2L -> Seq(-1.0, 0.0, 1.5),
      3L -> Seq(0.25, -2.0, 1.0))
    val got = Pca.covariance(emb(pts), 3).orderBy("i", "j")
      .as[(Long, Long, Long)].collect()
    // the floor-scale discipline: e12 integer terms, exact sums, /1e12
    // /n doubles, floor(x*1e9 + 0.5) surfacing — all plain IEEE ops
    def e12(x: Double): Long = math.floor(x * 1e12 + 0.5).toLong
    val xs = pts.map(_._2.map(_.toFloat.toDouble))
    val n = xs.length
    val mean = (0 until 3).map(i => xs.map(v => e12(v(i))).sum.toDouble / 1e12 / n)
    for ((i, j, covE9) <- got) {
      val (a, b) = (i.toInt - 1, j.toInt - 1)
      val sxy = xs.map(v => e12(v(a) * v(b))).sum.toDouble
      val want = math.floor(
        (sxy / 1e12 / n - mean(a) * mean(b)) * 1e9 + 0.5).toLong
      assert(covE9 === want, s"cov($i,$j)")
    }
    assert(got.length === 6)
  }

  test("top component of a line-shaped cloud is the line direction") {
    val pts = Seq(-2.0, -1.0, 0.0, 1.0, 2.0).zipWithIndex.map {
      case (t, i) => (i.toLong, Seq(0.6 * t, 0.8 * t))
    }
    val (mu, comps) = Pca.components(emb(pts), 2, 2)
    assert(math.abs(mu(0)) < 1e-9 && math.abs(mu(1)) < 1e-9)
    val v = comps(0)
    assert(math.abs(v(0) - 0.6) < 1e-6 && math.abs(v(1) - 0.8) < 1e-6,
      s"top component ${v.toSeq}")
    // canonical sign: largest-|coordinate| entry positive
    assert(v(1) > 0)
  }

  test("closed-form 2-D projection recovers the line direction exactly") {
    // points on t*(0.6, 0.8): the top component is (0.6, 0.8), so the
    // projection of each point is exactly t (its distance along the
    // line), up to the 6-dec rounding
    val pts = Seq(-2.0, -1.0, 0.0, 1.0, 2.0).zipWithIndex.map {
      case (t, i) => (i.toLong, Seq(0.6 * t, 0.8 * t))
    }
    val got = Pca.projectTop2d(emb(pts))
      .orderBy("vec_id").as[(Long, Long)].collect().map(_._2 / 1e6)
    val want = Seq(-2.0, -1.0, 0.0, 1.0, 2.0)
    for ((g, w) <- got.zip(want)) assert(math.abs(g - w) < 1e-5, s"$g vs $w")
    // diagonal covariance edge (b = 0 by symmetry): the larger-
    // variance axis wins, so the projection is the x coordinate
    val diag = Seq((1L, Seq(3.0, 1.0)), (2L, Seq(-3.0, 1.0)),
      (3L, Seq(3.0, -1.0)), (4L, Seq(-3.0, -1.0)))
    val d = Pca.projectTop2d(emb(diag))
      .orderBy("vec_id").as[(Long, Long)].collect().map(_._2 / 1e6)
    assert(d.toSeq === Seq(3.0, -3.0, 3.0, -3.0), d.toSeq)
  }

  test("fused momentStats is bit-identical to the distributed covariance plan") {
    // components() derives means + covariance driver-side from ONE
    // fused aggregation; every entry must equal what the standalone
    // covariance() plan (q_pca_cov's oracled surface) computes, bit
    // for bit — same decimal sums, same IEEE op order, same HALF_UP
    // rounding.
    import org.apache.spark.sql.functions.col
    val embeddings = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (n, mu, entries) = Pca.momentStats(embeddings, 16)
    assert(n === embeddings.count())
    val want = Pca.covariance(embeddings, 16).collect()
      .map(r => ((r.getLong(0).toInt - 1, r.getLong(1).toInt - 1),
        r.getLong(2) / 1e9)).toMap
    assert(entries.keySet === want.keySet)
    for ((k, v) <- want) assert(entries(k) === v, s"entry $k")
    // means too: same floor-scale decimal-sum / 1e12 / n arithmetic
    // as the plan
    val fns = org.apache.spark.sql.functions
    val wantMu = embeddings
      .select(fns.explode(
        fns.transform(fns.sequence(fns.lit(1), fns.lit(16)),
          i => fns.struct(i.as("i"),
            fns.floor(fns.element_at(col("embedding"), i).cast("double")
              * fns.lit(1e12) + fns.lit(0.5))
              .cast("decimal(38,0)").as("v")))).as("e"))
      .select(col("e.i"), col("e.v"))
      .groupBy("i").agg(fns.sum(col("v")).as("s"))
      .orderBy("i").collect()
      .map(r => r.getDecimal(1).doubleValue / 1e12 / n)
    for (i <- 0 until 16) assert(mu(i) === wantMu(i), s"mu($i)")
  }

  test("components are orthonormal; projection variances descend") {
    val embeddings = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (_, comps) = Pca.components(embeddings, 64, 3)
    for (a <- 0 until 3; b <- a until 3) {
      val dot = (0 until 64).map(i => comps(a)(i) * comps(b)(i)).sum
      if (a == b) assert(math.abs(dot - 1.0) < 1e-9, s"norm of $a")
      else assert(math.abs(dot) < 1e-6, s"orthogonality $a,$b")
    }
    val proj = Pca.project(embeddings, 64, 3)
      .as[(Long, Double, Double, Double)].collect()
      .map(r => Seq(r._2, r._3, r._4))
    def variance(k: Int): Double = {
      val vs = proj.map(_(k)); val m = vs.sum / vs.length
      vs.map(x => (x - m) * (x - m)).sum / vs.length
    }
    assert(variance(0) >= variance(1) - 1e-9)
    assert(variance(1) >= variance(2) - 1e-9)
    // projections center on ~0 (mean was subtracted)
    val m0 = proj.map(_(0)).sum / proj.length
    assert(math.abs(m0) < 1e-3)
  }

  test("projectPlanes plane 1 equals the closed-form projectTop2d") {
    // plane 1 of the blockwise projection IS the (dims 1,2) 2-D PCA —
    // same moments, same analytic eigenvector, same e6 surface — so
    // the two code paths must agree bit-for-bit on every row
    val embeddings = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val planes = Pca.projectPlanes(embeddings, 64, 4)
      .select("vec_id", "p1").as[(Long, Long)].collect().toMap
    val top2 = Pca.projectTop2d(embeddings)
      .as[(Long, Long)].collect().toMap
    assert(planes.keySet === top2.keySet)
    for ((id, p) <- planes) assert(p === top2(id), s"vec $id")
    // and the plane projections center on ~0 at e6 scale
    val p4 = Pca.projectPlanes(embeddings, 64, 4)
      .as[(Long, Long, Long, Long, Long)].collect()
    for (k <- 1 to 4) {
      val vs = p4.map(r => k match {
        case 1 => r._2; case 2 => r._3; case 3 => r._4; case _ => r._5 })
      val m = vs.map(_.toDouble).sum / vs.length
      assert(math.abs(m) < 2e3, s"plane $k mean ${m}")
    }
  }
}
