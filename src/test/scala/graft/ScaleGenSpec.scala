package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scale-audit corpus generator must preserve each copy's COSINE
  * geometry exactly (SCALE.md's exponents for cosine-based families
  * are meaningless otherwise) while decorrelating cross-copy
  * similarity. The per-copy signed permutation is orthogonal, so this
  * is checkable to float precision, not just statistically. */
class ScaleGenSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
    dot / math.sqrt(na * nb)
  }

  private def applyCopy(v: Array[Float], d: Int, seed: Int): Array[Float] = {
    val (perm, signs) = ScaleGen.signedPermutation(d, seed)
    Array.tabulate(d)(j => signs(j) * v(perm(j) - 1))
  }

  test("signedPermutation is a bijection with unit signs") {
    val (perm, signs) = ScaleGen.signedPermutation(64, seed = 3)
    assert(perm.sorted.toSeq == (1 to 64))
    assert(signs.forall(s => s == 1.0f || s == -1.0f))
    // deterministic: same seed, same transform
    assert(ScaleGen.signedPermutation(64, 3)._1.toSeq == perm.toSeq)
    // distinct copies get distinct transforms
    assert(ScaleGen.signedPermutation(64, 4)._1.toSeq != perm.toSeq)
  }

  test("per-copy transform preserves pairwise cosine exactly (orthogonal)") {
    val rng = new scala.util.Random(42)
    val d = 64
    val vecs = Array.fill(20)(Array.fill(d)(rng.nextGaussian().toFloat))
    for (seed <- 1 to 3; i <- 0 until 20; j <- (i + 1) until 20) {
      val before = cos(vecs(i), vecs(j))
      val after = cos(applyCopy(vecs(i), d, seed), applyCopy(vecs(j), d, seed))
      assert(math.abs(before - after) < 1e-6,
        s"copy $seed distorted cos($i,$j): $before -> $after")
    }
  }

  test("cross-copy similarity is decorrelated (mean |cos| stays small)") {
    val rng = new scala.util.Random(7)
    val d = 64
    // unit-ish vectors clustered around one direction: the worst case
    // for the old translation scheme (a shared offset dominated them)
    val base = Array.fill(d)(rng.nextGaussian().toFloat)
    val vecs = Array.fill(50)(base.zip(Array.fill(d)(
      0.3f * rng.nextGaussian().toFloat)).map { case (b, n) => b + n })
    val cross = for (i <- 0 until 50) yield
      math.abs(cos(applyCopy(vecs(i), d, 1), applyCopy(vecs(i), d, 2)))
    val meanAbs = cross.sum / cross.length
    // intra-copy these pairs have cos ~0.9; across copies the signed
    // permutations scatter them to near-orthogonal
    assert(meanAbs < 0.3, s"cross-copy mean |cos| = $meanAbs, not decorrelated")
  }

  test("the Spark-side column expression matches the driver-side transform") {
    val rng = new scala.util.Random(11)
    val d = 16
    val rows = (0L until 5L).map(i => (i, Array.fill(d)(rng.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val (perm, signs) = ScaleGen.signedPermutation(d, seed = 2)
    val out = df.withColumn("embedding",
        zip_with(lit(perm), lit(signs), (p, s) =>
          (element_at(col("embedding"), p) * s).cast("float")))
      .orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).toArray)
    for ((row, i) <- out.zipWithIndex) {
      val expect = applyCopy(rows(i)._2, d, 2)
      assert(row.toSeq == expect.toSeq, s"row $i mismatch")
    }
  }
}
