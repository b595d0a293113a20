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
    * the centroid id, iteration count is FIXED (no data-dependent
    * convergence probe), and cluster labels are the seed vectors' ids
    * throughout. Per iteration: one broadcast of k centroids + a
    * map-side argmax for assignment (no shuffle of the corpus), then
    * one (cluster, dim)-keyed aggregation to recompute means — both
    * shapes scale to 10⁹ vectors; k and dim stay driver-side tiny.
    * A cluster that loses every member keeps its previous centroid. */
  def kmeans(embeddings: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0 (got $k, $iters)")
    val points = embeddings
      .select(col("vec_id").as("pid"), col("embedding").as("pv"))
    var cents = embeddings.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("cid"),
        transform(col("embedding"), _.cast("double")).as("cent"))
      .localCheckpoint()
    def assign(c: DataFrame): DataFrame = points
      .crossJoin(broadcast(c))
      .groupBy("pid")
      .agg(max_by(col("cid"),
        struct(round(cosine(col("pv"), col("cent")), 9).as("s"),
          (-col("cid")).as("tie"))).as("cluster"))
    for (_ <- 0 until iters) {
      val members = assign(cents)
        .join(points, "pid")
        .select(col("cluster"), posexplode(col("pv")).as(Seq("pos", "x")))
      val dims = members
        .groupBy("cluster", "pos")
        .agg(avg(col("x").cast("double")).as("m"))
        .groupBy("cluster")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          _.getField("m")).as("cent"))
      // empty clusters keep their previous centroid (standard Lloyd's)
      val next = cents.select(col("cid"), col("cent").as("_prev"))
        .join(dims.withColumnRenamed("cluster", "cid"), Seq("cid"), "left")
        .select(col("cid"), coalesce(col("cent"), col("_prev")).as("cent"))
        .localCheckpoint()
      graft.Pins.free(cents) // superseded iteration, next is materialized
      cents = next
    }
    assign(cents).select(col("pid").as("vec_id"), col("cluster"))
  }

  /** Two-level deterministic k-means: a coarse √k-means over the
    * corpus, then √k fine centroids WITHIN each coarse cell —
    * vectorized across cells, never a per-cell driver loop. Returns
    * the same (vec_id, cluster) shape as `kmeans`, labels again seed
    * vec_ids (fine seeds are distinct corpus rows, so labels are
    * globally unique).
    *
    * Why it exists (round 17, measured in SCALE.md): flat k-means
    * assignment is N·k cosine evaluations — with k ∝ N (the
    * bounded-cluster requirement that keeps any pairwise consumer
    * linear) that is N²/c, and the second scaling decade measured
    * exactly that quadratic (q_semdedup kmeans 5.9 s at 20k×40 →
    * ~370 s at 200k×400). Two-level costs N·(√k coarse + k/√k fine)
    * = N·2√k per pass: with k ∝ N that is Θ(N^1.5) — stated
    * honestly, still super-linear asymptotically; the 100 TB
    * asymptote is a log-depth quantization tree (N·log N), of which
    * this is the depth-2 instance. At the measured decades the √k
    * factor is what turns a 100× blowup into ~10×.
    *
    * Fine assignment is one broadcast join of all k fine seeds
    * filtered by cell equality — each point meets only ITS cell's
    * fine seeds (N·√k intermediate rows, map-side max_by, no corpus
    * shuffle) — then the standard (cluster, dim) mean aggregation per
    * Lloyd round. The coarse partition is FROZEN while fine centroids
    * iterate (the IVF discipline); a fine cluster that loses every
    * member keeps its seed centroid. */
  def kmeansTwoLevel(embeddings: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0 (got $k, $iters)")
    val kc = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    val kf = math.max(1, math.ceil(k.toDouble / kc).toInt)
    if (kf <= 1) return kmeans(embeddings, kc, iters)
    val coarse = kmeans(embeddings, kc, iters)
      .select(col("vec_id").as("pid"), col("cluster").as("cell"))
    val pts = embeddings
      .select(col("vec_id").as("pid"), col("embedding").as("pv"))
      .join(coarse, "pid").localCheckpoint()
    // pts (eager) was coarse's last consumer; freeing it also unpins
    // the inner kmeans' final centroid checkpoint riding in its plan
    graft.Pins.free(coarse)
    // fine seeds: the kf lowest-id members of each cell (deterministic,
    // mirrors kmeans' lowest-id seeding); one corpus window, once
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cell").orderBy("pid")
    var cents = pts
      .withColumn("__rn", row_number().over(w)).where(col("__rn") <= kf)
      .select(col("cell"), col("pid").as("scid"),
        transform(col("pv"), _.cast("double")).as("cent"))
      .localCheckpoint()
    def assign(c: DataFrame): DataFrame = pts
      .join(broadcast(c), "cell") // k rows total; each point × its cell's seeds
      .groupBy("pid")
      .agg(max_by(col("scid"),
        struct(round(cosine(col("pv"), col("cent")), 9).as("s"),
          (-col("scid")).as("tie"))).as("cluster"))
    for (_ <- 0 until iters) {
      val members = assign(cents)
        .join(pts, "pid")
        .select(col("cell"), col("cluster"),
          posexplode(col("pv")).as(Seq("pos", "x")))
      val dims = members
        .groupBy("cell", "cluster", "pos")
        .agg(avg(col("x").cast("double")).as("m"))
        .groupBy("cell", "cluster")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          _.getField("m")).as("cent"))
      val next = cents.select(col("cell"), col("scid"), col("cent").as("_prev"))
        .join(dims.withColumnRenamed("cluster", "scid"),
          Seq("cell", "scid"), "left")
        .select(col("cell"), col("scid"),
          coalesce(col("cent"), col("_prev")).as("cent"))
        .localCheckpoint()
      graft.Pins.free(cents)
      cents = next
    }
    // Materialize the (vec_id, cluster) result — 2 narrow columns —
    // then free the corpus-sized pts pin and the seed frame: the
    // caller's frame must not keep (vec_id + embedding + cell) pinned
    // in block storage through whatever heavy stage follows (Pins
    // documents exactly this failure mode; pts is the one
    // corpus-sized checkpoint this operator takes).
    val out = assign(cents).select(col("pid").as("vec_id"), col("cluster"))
      .localCheckpoint()
    graft.Pins.free(pts)
    graft.Pins.free(cents)
    out
  }

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
