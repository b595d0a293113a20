package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]) — training-data pipeline extension.
  *
  * Scale design: brute force is the correctness baseline (queries ×
  * corpus is a broadcast-joinable product when the query set is small);
  * the scale path is random-hyperplane LSH bucketing, which prunes the
  * candidate set to same-bucket vectors before exact re-scoring. An IVF
  * variant would replace the hash bucketing with k-means coarse
  * centroids; the plumbing (bucket -> join -> rescore) is identical.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double
    * with a single left-to-right fold. Backed by the native codegen'd
    * expression (graft.functions.CosineSimilarity): the composed
    * zip_with + aggregate form runs on Catalyst's interpreted
    * higher-order-function path — 3 lambda-per-element folds and a
    * zipped-array allocation per pair — while the native expression is
    * one fused loop inside whole-stage codegen. Bit-identical results
    * (same element order, same double arithmetic); the equivalence is
    * spec-checked against the composed form below. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  /** The composed higher-order-function form — kept as the independent
    * reference implementation for the equivalence spec. */
  private[graft] def cosineComposed(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) = aggregate(
      zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))
  }

  /** Half-up floor-scaling of a cosine score to the e5 integer grid —
    * deterministic IEEE ops (multiply, add, floor), never engine
    * `ROUND(double, n)`, whose own output differs in the last ulp
    * across engines/versions on hash-checked columns. Kept as a
    * double inside ranking (TopKByScore's score type); e5 integers
    * are exactly representable, so ordering and the final long cast
    * are exact. */
  private def simE5(c: Column): Column =
    floor(c * lit(1e5) + lit(0.5)).cast("double")

  /** Brute-force top-k cosine neighbors for each query vector.
    * Query set is broadcast; ranking is deterministic (e5-grid score,
    * then id). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        simE5(cosine(col("qv"), col("cv"))).as("sim"))
    rankTopK(scored, k)
  }

  /** Rank scored (qid, cid, sim) candidates down to each query's k
    * best — (sim DESC, cid ASC), rank 1-based.
    *
    * Implemented with the native bounded-heap aggregate
    * (graft.functions.TopKByScore), not `row_number() OVER (PARTITION
    * BY qid)`: the window form shuffles EVERY scored candidate to its
    * query's reducer and sorts there — at corpus scale that exchange
    * is the whole job, and with few queries it collapses onto few
    * reducers. The aggregate reduces each scan partition to <= k pairs
    * per query map-side, so the exchange carries k x partitions rows
    * per query no matter how large the corpus; ranks then come from
    * the position in the already-sorted top-k array. Bit-identical to
    * the window form (same total order) on non-null scores, which the
    * ANN oracles pin. One deliberate divergence: rows with a null sim
    * or cid are SKIPPED, where the window form (DESC NULLS LAST)
    * surfaced null-sim rows once k reached the group's non-null count
    * — a null similarity is not a neighbor. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("qid")
      .agg(graft.functions.TopKByScore(col("sim"), col("cid"), k).as("nn"))
      .select(col("qid"), posexplode(col("nn")))
      .select(col("qid"), col("col.id").as("cid"),
        (col("pos") + lit(1)).as("rank"),
        col("col.score").cast("long").as("sim_e5"))

  /** Random-hyperplane LSH bucket id: `bits` pseudo-random hyperplanes,
    * plane j's component i a deterministic ±1 — data-independent, no
    * stored model. The bucket is the packed sign pattern of the `bits`
    * projections. Backed by the native codegen'd expression
    * (graft.functions.HyperplaneLsh): the composed form paid `bits`
    * interpreted higher-order folds per row. */
  def lshBucket(embedding: Column, bits: Int): Column =
    graft.functions.HyperplaneLsh(embedding, bits)

  /** IVF-style ANN: a coarse quantizer partitions the corpus into
    * `nlist` disjoint cells (every vector assigned to its most-similar
    * centroid); a query probes only its `nprobe` nearest cells and
    * re-scores exactly inside them, so candidate volume scales by
    * ~nprobe/nlist instead of the full corpus — the classic IVF shape
    * (billion-scale ANN surveys; same plumbing as lshTopK with learned
    * cells instead of hashed ones).
    *
    * The quantizer is deterministic and model-free — the `nlist`
    * lowest-id corpus vectors serve as centroids — so results are
    * reproducible for the oracle hash-compare without a stored k-means
    * model. With nprobe = nlist the search visits every cell and each
    * (query, corpus) pair is scored exactly once (cells are disjoint),
    * so the result must EQUAL brute force — the oracle-checked
    * invariant; nprobe << nlist is the production configuration.
    *
    * Scale notes: centroid assignment is one broadcast of nlist
    * vectors + a map-side `max_by` aggregation (no window sort over
    * the corpus); the probe join shuffles only same-cell candidates. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int, nprobe: Int): DataFrame = {
    val cent = corpus.orderBy("vec_id").limit(nlist)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent"))
    // corpus -> cell: argmax centroid similarity (ties impossible: the
    // struct comparison falls back to the distinct centroid id)
    val assigned = corpus
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      .crossJoin(broadcast(cent))
      .groupBy("cid")
      .agg(
        max_by(col("cent_id"),
          struct(round(cosine(col("cv"), col("cent")), 9).as("s"),
            (-col("cent_id")).as("tie"))).as("cell"),
        first(col("cv")).as("cv"))
    // query -> its nprobe nearest cells (bounded-heap top-k, like the
    // final ranking: reduces map-side to nprobe cells per query)
    val probes = queries
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .crossJoin(broadcast(cent))
      .select(col("qid"), col("qv"), col("cent_id"),
        round(cosine(col("qv"), col("cent")), 9).as("psim"))
      .groupBy("qid")
      .agg(first(col("qv")).as("qv"),
        graft.functions.TopKByScore(col("psim"), col("cent_id"), nprobe).as("_cells"))
      .select(col("qid"), col("qv"), explode(col("_cells")).as("_c"))
      .select(col("qid"), col("qv"), col("_c.id").as("cell"))
    val scored = assigned.join(broadcast(probes), "cell")
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        simE5(cosine(col("qv"), col("cv"))).as("sim"))
    rankTopK(scored, k)
  }

  /** Deterministic Lloyd's k-means over the embedding column — the
    * clustering step a training-data curation pipeline uses for
    * semantic grouping and cluster-balanced (diversity) sampling.
    *
    * Deterministic by construction, like ivfTopK's quantizer: the k
    * lowest-id vectors seed the centroids, assignment ties break on
    * the lowest centroid id, iteration count is FIXED (no
    * data-dependent convergence probe), and cluster labels are the
    * seed vectors' ids throughout. A cluster that loses every member
    * keeps its previous centroid.
    *
    * Scale shape (rewritten after the third scaling decade, SCALE.md):
    * centroids are MODEL state — k×d doubles, megabytes at any k this
    * engine clusters with — so they live on the DRIVER (the MLlib
    * KMeans discipline) and each Lloyd pass is (1) assignment as a
    * pure PROJECTION through the codegen'd NearestCentroid expression
    * (one output row per input row — no N×k join product, no corpus
    * shuffle; the old broadcast-join + max_by form materialized ~1 KB
    * per candidate row, which at 2M×4000 meant ~128 GB per pass and
    * was measured as 95% of the q_semdedup third-decade blowup) and
    * (2) one k-group aggregation of per-dimension means (d avg
    * columns over try_element_at — partial aggregation map-side, a
    * k-row exchange) collected back to the driver. Work per pass is
    * N·k cosine kernels inside whole-stage codegen and N·d doubles of
    * aggregation input; nothing wider than the input row ever
    * materializes. Seeds or recomputed means carrying a null element
    * (possible only for ragged/null-element embeddings) are skipped —
    * the label keeps its previous centroid, matching the old form
    * where a null-element centroid scored null and was unpickable.
    *
    * Output contract on degenerate POINTS (not just centroids): a
    * vector with a null element, or whose length matches no
    * centroid's (ragged corpora), gets a NULL cluster — it has no
    * well-defined cosine to any centroid. Well-formed corpora (every
    * embedding same length, no null elements — all the engine's
    * fixtures) are a total partition; downstream cluster-key
    * consumers over ragged corpora must filter or coalesce the null
    * label (spec-pinned in SimilaritySpec). */
  def kmeans(embeddings: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0 (got $k, $iters)")
    require(k <= 65536,
      s"flat k-means keeps its k×d model driver-side; k = $k exceeds " +
        "65536 — use kmeansTwoLevel, whose per-level model is √k")
    val points = embeddings
      .select(col("vec_id").as("pid"), col("embedding").as("pv"))
    val model = lloydModel(points, seedModel(points, k), iters)
    if (model.isEmpty)
      return points.select(col("pid").as("vec_id"),
        lit(null).cast("long").as("cluster"))
    points.select(col("pid").as("vec_id"),
      graft.functions.NearestCentroid(col("pv"), model).as("cluster"))
  }

  /** The k lowest-id vectors as the deterministic seed model
    * (label = seed vec_id), collected driver-side. Seeds with a null
    * element are skipped (see kmeans scaladoc). */
  private def seedModel(points: DataFrame, k: Int): Seq[(Long, Array[Double])] =
    points.orderBy("pid").limit(k)
      .select(col("pid"), col("pv"))
      .collect().flatMap { r =>
        val s = r.getSeq[Any](1)
        if (s == null || s.contains(null)) None
        else Some(r.getLong(0) -> s.map {
          case f: Float => f.toDouble
          case d: Double => d
        }.toArray)
      }.toIndexedSeq

  /** `iters` Lloyd rounds over a driver-side model: assignment via
    * NearestCentroid projection, means via one k-group aggregation of
    * d per-dimension avg columns, collected and folded into the next
    * model. Empty clusters (and null-element means) keep the previous
    * centroid. `d` is the max SEED length: an all-empty-seed model is
    * returned unchanged (nothing to recompute), and a corpus vector
    * LONGER than every seed contributes only its first d dims to mean
    * recomputation — assignment already nulls length-mismatched
    * vectors, so the truncation can only touch rows no centroid
    * scores anyway. */
  private def lloydModel(points: DataFrame,
      seed: Seq[(Long, Array[Double])], iters: Int)
      : Seq[(Long, Array[Double])] = {
    var model = seed
    if (model.isEmpty) return model
    val d = model.iterator.map(_._2.length).max
    if (d == 0 || iters == 0) return model
    for (_ <- 0 until iters) {
      val means = points
        .withColumn("__c", graft.functions.NearestCentroid(col("pv"), model))
        .where(col("__c").isNotNull)
        .groupBy("__c")
        .agg(avgDims(d).head, avgDims(d).tail: _*)
        .collect()
        .flatMap(r => meanOf(r, 1, d).map(r.getLong(0) -> _))
        .toMap
      model = model.map { case (l, prev) => l -> means.getOrElse(l, prev) }
    }
    model
  }

  /** d per-dimension mean columns (1-based try_element_at — null past
    * a ragged row's end, and avg skips nulls, exactly like the old
    * posexplode form). */
  private def avgDims(d: Int): Seq[Column] =
    (0 until d).map(i =>
      avg(try_element_at(col("pv"), lit(i + 1)).cast("double")).as(s"__m$i"))

  /** The d means starting at `off` in a collected row, or None when
    * any is null (keep the previous centroid). */
  private def meanOf(r: org.apache.spark.sql.Row, off: Int, d: Int)
      : Option[Array[Double]] = {
    val a = new Array[Double](d)
    var i = 0
    while (i < d) {
      if (r.isNullAt(off + i)) return None
      a(i) = r.getDouble(off + i)
      i += 1
    }
    Some(a)
  }

  /** Two-level deterministic k-means: a coarse √k-means over the
    * corpus, then √k fine centroids WITHIN each coarse cell. Returns
    * the same (vec_id, cluster) shape as `kmeans`, labels again seed
    * vec_ids (fine seeds are distinct corpus rows, so labels are
    * globally unique).
    *
    * Why it exists (round 17, measured in SCALE.md): flat k-means
    * assignment is N·k cosine kernels per pass — with k ∝ N (the
    * bounded-cluster requirement that keeps any pairwise consumer
    * linear) that is N²/c. Two-level costs N·2√k per pass: with
    * k ∝ N that is Θ(N^1.5) — stated honestly, still super-linear
    * asymptotically; the 100 TB asymptote is a log-depth quantization
    * tree (N·log N), of which this is the depth-2 instance.
    *
    * Like `kmeans` (and rewritten with it after the third-decade
    * audit), all centroid state is a driver-side model: the coarse
    * model feeds a NearestCentroid cell projection, fine seeds are
    * the kf lowest-id members per cell (one corpus window), and fine
    * Lloyd rounds assign through the per-cell NearestCentroidIn
    * projection + one (cell, cluster)-group mean aggregation. ZERO
    * corpus shuffles per pass, zero cached frames, no join products —
    * the third decade measured the old broadcast-join form at 1634 s
    * of q_semdedup's 1713 s (α ≈ 1.9); this form re-measures at
    * SCALE.md's updated table. The coarse partition is FROZEN while
    * fine centroids iterate (the IVF discipline); a fine cluster that
    * loses every member keeps its seed centroid. Coarse cells are
    * bit-identical to `kmeans(embeddings, kc, iters)` — both run the
    * same seed + Lloyd model fold — which the q_kmeans_twolevel
    * cross-cell invariant recomputes and checks. */
  def kmeansTwoLevel(embeddings: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0 (got $k, $iters)")
    val kc = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    val kf = math.max(1, math.ceil(k.toDouble / kc).toInt)
    if (kf <= 1) return kmeans(embeddings, kc, iters)
    val points = embeddings
      .select(col("vec_id").as("pid"), col("embedding").as("pv"))
    val cmodel = lloydModel(points, seedModel(points, kc), iters)
    if (cmodel.isEmpty)
      return points.select(col("pid").as("vec_id"),
        lit(null).cast("long").as("cluster"))
    val cell = graft.functions.NearestCentroid(col("pv"), cmodel)
    fineStage(points, cell, kf, iters) match {
      case Some(fmodel) => points.select(col("pid").as("vec_id"),
        graft.functions.NearestCentroidIn(cell, col("pv"), fmodel)
          .as("cluster"))
      case None => points.select(col("pid").as("vec_id"),
        lit(null).cast("long").as("cluster"))
    }
  }

  /** One per-cell fine k-means stage — the building block both
    * kmeansTwoLevel (one instance) and kmeansTree (depth−1 chained
    * instances) assemble. Seeds are the `fan` lowest-id members of
    * each cell of `cellOf` (one corpus window, collected — ≤
    * cells·fan model rows), then `iters` Lloyd rounds with the cell
    * partition FROZEN: assignment is the NearestCentroidIn projection
    * keyed by `cellOf`, means one (cell, label)-group aggregation of
    * per-dimension avgs folded into the driver model. A fine cluster
    * that loses every member (or recomputes a null-element mean)
    * keeps its seed centroid. None when no cell yields a clean seed
    * (every candidate has a null element — degenerate corpus). */
  private def fineStage(points: DataFrame, cellOf: Column, fan: Int,
      iters: Int): Option[Map[Long, Seq[(Long, Array[Double])]]] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__cell").orderBy("pid")
    val seedRows = points.withColumn("__cell", cellOf)
      .where(col("__cell").isNotNull)
      .withColumn("__rn", row_number().over(w)).where(col("__rn") <= fan)
      .select(col("__cell"), col("pid"), col("pv"))
      .collect()
    var fmodel: Map[Long, Seq[(Long, Array[Double])]] = seedRows
      .flatMap { r =>
        val s = r.getSeq[Any](2)
        if (s == null || s.contains(null)) None
        else Some((r.getLong(0), r.getLong(1), s.map {
          case f: Float => f.toDouble
          case d: Double => d
        }.toArray))
      }
      .groupBy(_._1)
      .map { case (c, rows) => c -> rows.map(t => (t._2, t._3)).toSeq }
    if (fmodel.isEmpty) return None
    val d = fmodel.valuesIterator.flatMap(_.iterator.map(_._2.length)).max
    if (d == 0) return Some(fmodel)
    for (_ <- 0 until iters) {
      val means = points.withColumn("__cell", cellOf)
        .withColumn("__c",
          graft.functions.NearestCentroidIn(col("__cell"), col("pv"), fmodel))
        .where(col("__c").isNotNull)
        .groupBy("__cell", "__c")
        .agg(avgDims(d).head, avgDims(d).tail: _*)
        .collect()
        .flatMap(r => meanOf(r, 2, d).map((r.getLong(0), r.getLong(1)) -> _))
        .toMap
      fmodel = fmodel.map { case (c, cl) =>
        c -> cl.map { case (l, prev) => l -> means.getOrElse((c, l), prev) }
      }
    }
    Some(fmodel)
  }

  /** Log-depth k-means quantization tree — the 100 TB assignment
    * shape SCALE.md's third decade named: where flat k-means pays N·k
    * cosine kernels per pass and two-level N·2√k, the tree splits
    * `fan`-way per level to depth ⌈log_branch k⌉, so assignment is
    * N·fan·depth = N·O(log k) kernels under ANY k — the Θ(N^1.5)
    * asymptote of k ∝ N two-level clustering drops to N·log N.
    *
    * Construction is kmeansTwoLevel's discipline applied recursively:
    * level 1 is the flat driver-model Lloyd over `fan` seeds; each
    * further level runs `fineStage` keyed by the COMPOSED assignment
    * expression of all frozen outer levels (labels are corpus
    * vec_ids, globally unique, so the running cell id needs no path
    * encoding), and the final assignment is one codegen'd projection
    * chain — zero corpus shuffles and zero cached frames at any
    * depth, exactly like the depth-2 instance. `fan` is the smallest
    * per-level split with fan^depth ≥ k, so the leaf count overshoots
    * k the same bounded way two-level's kc·kf does. Driver model
    * state totals ≤ ~k·fan/(fan−1) centroids across levels — the
    * same order as any k-cluster model.
    *
    * Determinism contract is kmeans'/kmeansTwoLevel's: lowest-id
    * seeding per cell, ascending-label strict-compare tie-break,
    * fixed iteration count, frozen outer partitions; a vector whose
    * level assignment is null (null element / no length-matched
    * centroid) stays null through the chain. At depth 2 with k a
    * perfect square this is BIT-IDENTICAL to kmeansTwoLevel (same
    * fan arithmetic — spec-pinned); at depth 1 (k ≤ branch) it IS
    * flat kmeans. */
  def kmeansTree(embeddings: DataFrame, k: Int, iters: Int,
      branch: Int = 64): DataFrame = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0 (got $k, $iters)")
    require(branch >= 2 && branch <= 65536,
      s"need 2 <= branch <= 65536 (got $branch)")
    var depth = 1
    var leaves = branch.toLong
    while (leaves < k) { depth += 1; leaves *= branch }
    if (depth <= 1) return kmeans(embeddings, k, iters)
    // the smallest balanced per-level fan with fan^depth >= k
    // (integer search around the fp root, immune to pow() ulp error)
    var fan = math.max(2, math.ceil(math.pow(k.toDouble, 1.0 / depth)).toInt)
    while (BigInt(fan).pow(depth) < k) fan += 1
    while (fan > 2 && BigInt(fan - 1).pow(depth) >= k) fan -= 1
    val points = embeddings
      .select(col("vec_id").as("pid"), col("embedding").as("pv"))
    val cmodel = lloydModel(points, seedModel(points, fan), iters)
    if (cmodel.isEmpty)
      return points.select(col("pid").as("vec_id"),
        lit(null).cast("long").as("cluster"))
    var cell: Column = graft.functions.NearestCentroid(col("pv"), cmodel)
    for (_ <- 2 to depth) {
      fineStage(points, cell, fan, iters) match {
        case Some(fmodel) =>
          cell = graft.functions.NearestCentroidIn(cell, col("pv"), fmodel)
        case None =>
          return points.select(col("pid").as("vec_id"),
            lit(null).cast("long").as("cluster"))
      }
    }
    points.select(col("pid").as("vec_id"), cell.as("cluster"))
  }

  /** The kernel budget below which FLAT k-means wins: one model, no
    * window/seed passes, and at ≲ 2^27 total point×centroid kernels
    * the whole assignment is sub-second on a 32-thread host — the
    * regime SCALE.md measured two-level costing MORE than flat (extra
    * Lloyd loops + the seed window) at fixture scale. Above it the
    * kernel count itself is the cost and the log-depth tree wins. */
  private[graft] val FlatKernelBudget: Long = 1L << 27

  /** Which assignment shape kmeansAuto picks for a corpus of n
    * vectors and k clusters — exposed for the dispatch-boundary
    * spec. Flat requires its whole model driver-side (k ≤ 65536) AND
    * an n·k kernel bill under FlatKernelBudget; everything else goes
    * to the log-depth tree. */
  private[graft] def kmeansPlanFor(n: Long, k: Int): String =
    if (k <= 65536 && n * k.toLong <= FlatKernelBudget) "flat" else "tree"

  /** Auto-dispatched k-means: flat below the measured N·k crossover
    * (SCALE.md — tree rounds cost more than flat's single model at
    * toy scale), the log-depth kmeansTree above it (or whenever k
    * exceeds flat's driver-model cap). Same output shape and
    * determinism contract either way; the LABELS differ between
    * shapes (flat seeds corpus-wide, the tree per cell), so callers
    * needing a pinned shape call one directly. */
  def kmeansAuto(embeddings: DataFrame, k: Int, iters: Int): DataFrame =
    if (kmeansPlanFor(embeddings.count(), k) == "flat")
      kmeans(embeddings, k, iters)
    else kmeansTree(embeddings, k, iters)


  /** LSH-bucketed ANN: exact cosine re-scoring within same-bucket
    * candidates only. Recall < 1 by construction; at scale the bucket
    * join replaces the quadratic cross product. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"),
      lshBucket(col("embedding"), bits).as("bucket"))
    val c = corpus.select(col("vec_id").as("cid"), col("embedding").as("cv"),
      lshBucket(col("embedding"), bits).as("bucket"))
    val scored = c.join(broadcast(q), "bucket")
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        simE5(cosine(col("qv"), col("cv"))).as("sim"))
    rankTopK(scored, k)
  }
}
