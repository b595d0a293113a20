package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA over an embedding column — the dimensionality-reduction stage a
  * SemDeDup-style curation pipeline runs before clustering (Abbas et
  * al. 2023 PCA-reduce embeddings ahead of k-means), and the
  * whitening/compression knob for ANN indexes.
  *
  * Reference analogue: none — pipeline extension beside Similarity
  * (k-means, ANN) and Quantize.
  *
  * Split by where the work runs:
  *   - `covariance` is the DISTRIBUTED half: per-pair products sum
  *     exactly (each product floor-scales to an e12 integer and sums
  *     as DECIMAL, so the aggregation is addition-order-free and
  *     bit-identical across engines — a double sum would drift with
  *     partial-aggregation order), then cov(i,j) surfaces as the
  *     floor-scaled e9 BIGINT `cov_e9` — deterministic IEEE ops only,
  *     no engine `ROUND(double)` anywhere in the chain. One
  *     map-side-combinable aggregation whose keyspace is d*(d+1)/2
  *     entries regardless of corpus size — the d^2-per-row explode
  *     collapses inside each partition before any shuffle.
  *   - `components` is the DRIVER half: power iteration with
  *     deflation over the collected (tiny, d x d) e9-GRID matrix.
  *     Determinism comes from the input: any engine that computes the
  *     same grid covariance feeds the same doubles through the
  *     same arithmetic. Signs are canonicalized (largest-|coordinate|
  *     positive).
  *   - `project` folds mu and the k component vectors back into the
  *     SCAN as literal arrays: each row's projection is a per-row
  *     fold over its own embedding — zero joins, zero shuffles over
  *     the corpus (the Dsir literal-array discipline).
  */
object Pca {

  private def dims(d: Int): Column = sequence(lit(1), lit(d))

  private def x(i: Column): Column =
    element_at(col("embedding"), i).cast("double")

  /** Half-up scaling of a double to an integer grid via deterministic
    * IEEE ops only — multiply, add, floor — never engine `ROUND`
    * (`ROUND(double, n)` lands on different last-ulp doubles across
    * engines/versions; floor of `x*10^k + 0.5` is bit-identical in
    * any IEEE-754 engine given bit-identical x). */
  private def e(xc: Column, scale: Double): Column =
    floor(xc * lit(scale) + lit(0.5))

  /** Upper-triangle covariance entries: (i, j, cov_e9) for 1 <= i <=
    * j <= d, with cov_e9 = the population covariance scaled by 1e9
    * and half-up'd via floor arithmetic — an exact BIGINT surface.
    * Per-term products scale to e12 integers (floor, not ROUND) and
    * sum as DECIMAL(38,0), so the aggregation is addition-order-free
    * and the whole chain is deterministic IEEE arithmetic in a fixed
    * op order — bit-identical across engines.
    *
    * EAGER since round 18: the one corpus aggregation job runs at
    * CALL time (momentStatsE9 collects its d(d+1)/2-row result) and
    * the returned frame is a driver-local relation over the derived
    * grid — callers must not compose this into plans they expect to
    * stay lazy, and the inputs must be fully materialized before the
    * call. */
  def covariance(embeddings: DataFrame, d: Int): DataFrame = {
    // ONE corpus pass (round 18): the pre-r18 plan ran FIVE scans of
    // the corpus — the pair-product explode, the mean explode TWICE
    // (the mi and mj join sides plan as separate subtrees: the
    // explode's lambda-bound transform defeats plan canonicalization,
    // so exchange reuse cannot dedupe them) and the count twice. The
    // mean terms ride the same exploded aggregation as the products
    // (momentStatsE9, the driver half's discipline), the collected
    // result is d + d(d+1)/2 rows — bounded by the embedding width,
    // never corpus-scale — and the final cov_e9 derivation replays
    // the EXACT double op order of the old plan (decimal→double,
    // /1e12, /n, − mi·mj, floor(·1e9 + 0.5)), all correctly-rounded
    // IEEE ops, so every value is bit-identical to the five-scan
    // plan's (oracle unchanged, spec-pinned vs the in-memory model).
    val (n, _, entries) = momentStatsE9(embeddings, d)
    val out = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("j",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cov_e9",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val rows: java.util.List[org.apache.spark.sql.Row] =
      if (n == 0) java.util.Collections.emptyList()
      else java.util.Arrays.asList((for {
        i <- 0 until d
        j <- i until d
      } yield org.apache.spark.sql.Row(
        (i + 1).toLong, (j + 1).toLong, entries((i, j)))): _*)
    embeddings.sparkSession.createDataFrame(rows, out)
  }

  /** (mean vector, top-k orthonormal principal components) via power
    * iteration + deflation on the rounded covariance. Driver-side on a
    * d x d matrix — d is the embedding width, never corpus-scale. */
  def components(embeddings: DataFrame, d: Int, k: Int,
      iters: Int = 100): (Array[Double], Array[Array[Double]]) = {
    // ONE corpus pass for everything: the per-dimension sums ride the
    // same exploded aggregation as the pair products (j = 0 marks the
    // mean rows), and every group's row count IS n. The collected
    // result is d + d(d+1)/2 rows — bounded by the embedding width,
    // never corpus-scale — and the mean/covariance arithmetic replays
    // driver-side with the exact double ops and HALF_UP rounding the
    // distributed covariance() plan uses, so the entries are
    // bit-identical to what covariance() computes.
    val (n, meanRows, entries) = momentStats(embeddings, d)
    require(n > 0, "components over an empty corpus")
    val c = Array.tabulate(d, d)((a, b) =>
      entries.getOrElse((math.min(a, b), math.max(a, b)), 0.0))
    val comps = Array.ofDim[Array[Double]](k)
    for (ki <- 0 until k) {
      var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
      var it = 0
      while (it < iters) {
        val w = Array.tabulate(d)(a =>
          (0 until d).foldLeft(0.0)((acc, b) => acc + c(a)(b) * v(b)))
        // re-orthogonalize against settled components every step:
        // deflation alone leaves O(convergence-gap) leakage when
        // eigenvalues cluster, Gram-Schmidt pins orthogonality to
        // machine precision regardless
        for (p <- 0 until ki) {
          val dot = (0 until d).foldLeft(0.0)((acc, a) => acc + w(a) * comps(p)(a))
          for (a <- 0 until d) w(a) -= dot * comps(p)(a)
        }
        val norm = math.sqrt(w.map(x => x * x).sum)
        v = if (norm > 0) w.map(_ / norm) else v
        it += 1
      }
      // a (deflated-to-)zero matrix leaves w = 0 every step and the
      // uniform start vector would repeat for every component — fall
      // back to the standard basis vector, which keeps the returned
      // set orthonormal (all remaining eigenvalues are 0, so any
      // orthonormal completion is equally valid)
      val residual = (0 until d).foldLeft(0.0)((acc, a) =>
        acc + math.abs((0 until d).foldLeft(0.0)((s2, b) => s2 + c(a)(b) * v(b))))
      if (residual == 0.0) {
        // first standard basis vector with a nonzero component outside
        // span(prior comps) — with ki < d one always exists
        var found = false
        var j = 0
        while (!found && j < d) {
          val cand = Array.fill(d)(0.0)
          cand(j) = 1.0
          for (p2 <- 0 until ki) {
            val dot = (0 until d).foldLeft(0.0)((acc, a) =>
              acc + cand(a) * comps(p2)(a))
            for (a <- 0 until d) cand(a) -= dot * comps(p2)(a)
          }
          val nz = math.sqrt(cand.map(x => x * x).sum)
          if (nz > 1e-9) { v = cand.map(_ / nz); found = true }
          j += 1
        }
      }
      // canonical sign: the largest-|coordinate| entry is positive
      val pivot = (0 until d).maxBy(a => (math.abs(v(a)), -a))
      if (v(pivot) < 0) v = v.map(-_)
      val lambda = (0 until d).foldLeft(0.0)((acc, a) =>
        acc + v(a) * (0 until d).foldLeft(0.0)((s, b) => s + c(a)(b) * v(b)))
      // deflate: C -= lambda * v v^T
      for (a <- 0 until d; b <- 0 until d) c(a)(b) -= lambda * v(a) * v(b)
      comps(ki) = v
    }
    (meanRows, comps)
  }

  /** One corpus pass collecting every moment `components` needs:
    * (n, per-dimension means, rounded upper-triangle covariance
    * entries keyed by 0-based (i, j)). The exploded struct stream
    * carries BOTH the mean terms (as j = 0 rows) and the pair-product
    * terms through one map-side-combinable aggregation whose keyspace
    * is d + d(d+1)/2 regardless of corpus size; n falls out as any
    * group's row count. The driver-side mean/cov derivation uses the
    * same IEEE double ops in the same order as [[covariance]]'s plan
    * (decimal→double cast, /1e12, /n, subtract mi*mj, floor-scale to
    * e9 — all correctly-rounded IEEE ops, portable everywhere), so
    * the entries are bit-identical to the distributed computation
    * (spec-pinned). Returned cov entries are the e9-grid doubles
    * `cov_e9 / 1e9`. */
  private[operators] def momentStats(embeddings: DataFrame, d: Int)
      : (Long, Array[Double], Map[(Int, Int), Double]) = {
    val (n, mu, e9) = momentStatsE9(embeddings, d)
    (n, mu, e9.map { case (k, v) => k -> v / 1e9 })
  }

  /** [[momentStats]] with the covariance entries kept on the RAW e9
    * integer grid (exact longs) — [[covariance]]'s output surface is
    * the e9 BIGINT itself, and a double round-trip through `/1e9`
    * would not reproduce it bit-exactly. */
  private[operators] def momentStatsE9(embeddings: DataFrame, d: Int)
      : (Long, Array[Double], Map[(Int, Int), Long]) = {
    val rows = embeddings.select(explode(concat(
        transform(dims(d), i => struct(i.as("i"), lit(0).as("j"),
          e(x(i), 1e12).cast("decimal(38,0)").as("p"))),
        flatten(transform(dims(d), i => transform(sequence(i, lit(d)), j =>
          struct(i.as("i"), j.as("j"),
            e(x(i) * x(j), 1e12).cast("decimal(38,0)").as("p"))))))).as("e"))
      .select(col("e.i"), col("e.j"), col("e.p"))
      .groupBy("i", "j").agg(sum(col("p")).as("s"), count(lit(1)).as("n"))
      .collect()
    if (rows.isEmpty) return (0L, Array.fill(d)(0.0), Map.empty)
    val n = rows.head.getLong(3)
    val mu = Array.ofDim[Double](d)
    for (row <- rows if row.getInt(1) == 0)
      mu(row.getInt(0) - 1) = row.getDecimal(2).doubleValue / 1e12 / n
    val entries = rows.iterator.filter(_.getInt(1) != 0).map { row =>
      val (i, j) = (row.getInt(0) - 1, row.getInt(1) - 1)
      val covE9 = math.floor(
        (row.getDecimal(2).doubleValue / 1e12 / n - mu(i) * mu(j)) * 1e9 + 0.5)
      (i, j) -> covE9.toLong
    }.toMap
    (n, mu, entries)
  }

  /** Projection onto the top principal component of the FIRST TWO
    * dimensions, eigenvector by the closed form for a symmetric 2x2
    * matrix: lambda = (a+c)/2 + sqrt(((a-c)/2)^2 + b^2), v prop.
    * (b, lambda - a) — no iteration, so (unlike the power-iteration
    * path) the WHOLE computation is SQL-expressible and oracle-exact:
    * a, b, c come from the e9-grid decimal-sum covariance, sqrt is
    * IEEE-correctly-rounded, and the remaining double arithmetic is
    * deterministic in any engine. Canonical sign: the largest-|coord|
    * component positive (first on ties). Output (vec_id, proj_e6)
    * with proj_e6 = (x - mu) . v floor-scaled to an exact e6
    * BIGINT. */
  def projectTop2d(embeddings: DataFrame): DataFrame = {
    // one fused stats pass (round 18): covariance + means off the
    // same momentStatsE9 collect — this path used to run covariance's
    // scans AND meanVector's (count + mean explode) back to back.
    // momentStatsE9's mu replays meanVector's exact op order
    // (decimal→double, /1e12, /n), so the projection literals are
    // bit-identical to the old two-pass derivation.
    val (n, mu, cov) = momentStatsE9(embeddings, 2)
    require(n > 0, "projectTop2d over an empty corpus")
    val (a, b, c) =
      (cov((0, 0)) / 1e9, cov((0, 1)) / 1e9, cov((1, 1)) / 1e9)
    val lam = (a + c) / 2 + math.sqrt((a - c) / 2 * ((a - c) / 2) + b * b)
    val (r1, r2) = if (b != 0.0) (b, lam - a)
      else if (a >= c) (1.0, 0.0) else (0.0, 1.0)
    val norm = math.sqrt(r1 * r1 + r2 * r2)
    var (v1, v2) = (r1 / norm, r2 / norm)
    val flip = if (math.abs(v1) >= math.abs(v2)) v1 < 0 else v2 < 0
    if (flip) { v1 = -v1; v2 = -v2 }
    embeddings.select(col("vec_id"),
      e((x(lit(1)) - lit(mu(0))) * lit(v1) +
        (x(lit(2)) - lit(mu(1))) * lit(v2), 1e6).as("proj_e6"))
  }

  /** Blockwise (subspace) PCA projection — the rotation stage of an
    * OPQ-style product-quantization pipeline: the embedding splits
    * into k consecutive 2-D planes (dims 2p−1, 2p) and each plane
    * projects onto ITS OWN top principal component by the closed-form
    * symmetric-2x2 eigenvector (the [[projectTop2d]] arithmetic, once
    * per plane). Output (vec_id, p1 .. pk) with each column the
    * plane's projection floor-scaled to an exact e6 BIGINT.
    *
    * Unlike the full-rank [[project]] (whose power-iteration
    * eigensolver is driver-side and not expressible in an external
    * SQL oracle), EVERY step here — e9-grid decimal-sum covariance,
    * IEEE sqrt, fixed op order, canonical sign, floor-scaled integer
    * surface — mirrors into portable SQL, so the whole projection is
    * oracle-exact end to end. Scale shape: ONE fused corpus pass for
    * all plane moments (keyspace 2k + k(2k+1) groups, never
    * corpus-scale), then the per-plane (mu, v) ride the projection
    * scan as literals — zero corpus joins or shuffles. */
  def projectPlanes(embeddings: DataFrame, d: Int, k: Int): DataFrame = {
    require(2 * k <= d, s"$k planes need ${2 * k} dims, embedding has $d")
    val (n, mu, entries) = momentStats(embeddings, 2 * k)
    require(n > 0, "projectPlanes over an empty corpus")
    val projs = (0 until k).map { p =>
      val (i, j) = (2 * p, 2 * p + 1) // 0-based plane dims
      val a = entries.getOrElse((i, i), 0.0)
      val b = entries.getOrElse((i, j), 0.0)
      val c = entries.getOrElse((j, j), 0.0)
      // identical op order to projectTop2d (and the SQL oracle): the
      // doubles that come out are bit-identical in any IEEE engine
      val lam = (a + c) / 2 + math.sqrt((a - c) / 2 * ((a - c) / 2) + b * b)
      val (r1, r2) = if (b != 0.0) (b, lam - a)
        else if (a >= c) (1.0, 0.0) else (0.0, 1.0)
      val norm = math.sqrt(r1 * r1 + r2 * r2)
      var (v1, v2) = (r1 / norm, r2 / norm)
      val flip = if (math.abs(v1) >= math.abs(v2)) v1 < 0 else v2 < 0
      if (flip) { v1 = -v1; v2 = -v2 }
      e((x(lit(i + 1)) - lit(mu(i))) * lit(v1) +
        (x(lit(j + 1)) - lit(mu(j))) * lit(v2), 1e6).as(s"p${p + 1}")
    }
    embeddings.select((col("vec_id") +: projs).toIndexedSeq: _*)
  }

  /** Project every embedding onto the top-k principal components:
    * (vec_id, p1 .. pk) — one SCALAR double column per component,
    * rounded to 6 decimals. Scalars, not an array<double>: downstream
    * consumers (and the correctness harness) sort and hash rows, and
    * array columns are unsortable/unhashable in columnar compare
    * tools. mu and the components ride the plan as literals — the
    * projection is a pure scan-stage fold per row (zero joins or
    * shuffles over the corpus), fed by the single stats pass in
    * [[components]]: 2 corpus scans total. */
  def project(embeddings: DataFrame, d: Int, k: Int,
      iters: Int = 100): DataFrame = {
    val (mu, comps) = components(embeddings, d, k, iters)
    val muArr = array(mu.map(lit(_)).toIndexedSeq: _*)
    val projs = comps.zipWithIndex.map { case (v, ki) =>
      val cv = array(v.map(lit(_)).toIndexedSeq: _*)
      round(aggregate(dims(d), lit(0.0), (acc, i) =>
        acc + (x(i) - element_at(muArr, i)) * element_at(cv, i)), 6)
        .as(s"p${ki + 1}")
    }
    embeddings.select((col("vec_id") +: projs.toIndexedSeq): _*)
  }
}
