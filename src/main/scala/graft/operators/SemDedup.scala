package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
  * deduplication of an embedding corpus — k-means cluster the
  * embedding space, then WITHIN each cluster drop every vector that
  * has a lower-id clustermate at/above the cosine threshold. The
  * cluster stage is what makes the pairwise stage tractable: candidate
  * pairs are same-cluster only, so the quadratic term is bounded by
  * cluster size, never corpus size.
  *
  * Reference analogue: none (DriftDB has no embedding surface) —
  * pipeline extension beside `Dedup.cosineNearDupPairs` (the
  * LSH-prefiltered variant of the same pruning; SemDeDup trades LSH's
  * random buckets for learned centroids, which group semantically).
  *
  * Drop rule (`keep lowest id`, seen-semantics): x drops iff SOME
  * lower-id y in x's cluster has cos(x, y) >= minCos, whether or not y
  * itself drops. Drop-chain independence makes the survivor set
  * order-free and exactly re-derivable — the q_semdedup invariants
  * re-check every drop against an independently recomputed witness.
  *
  * 100 TB shape: kmeans is iterated broadcast-argmax + one
  * (cluster, dim) aggregation per round (no corpus shuffle — see
  * Similarity.kmeans); the pairwise stage shuffles the corpus ONCE on
  * the cluster key. Choose k proportional to corpus size (the paper
  * uses ~sqrt(N) to ~N/100) so per-cluster membership — and with it
  * both the per-key quadratic work and any one reducer's share — stays
  * bounded as the corpus grows. A skewed embedding space can still
  * hand one centroid a corpus-scale cluster regardless of k;
  * `maxClusterSize` bounds that tail by recursively re-splitting any
  * cluster above the cap with a sub-k-means over its own members, so
  * no cluster — and with it no reducer's candidate-pair share — ever
  * exceeds cap (work per key <= cap², total pairwise work <= N·cap).
  */
object SemDedup {

  /** Survivors of semantic dedup: (vec_id, cluster). Pass
    * `precomputed` to reuse an existing k-means assignment (e.g. one
    * shared with cluster-balanced sampling) instead of clustering
    * again — `Similarity.kmeans` is deterministic, so the result is
    * identical either way. `maxClusterSize` re-splits oversized
    * clusters before the pairwise stage (see `resplitOversized`);
    * None = the paper's plain configuration.
    *
    * At scale (rounds 17–18, SCALE.md): size k ∝ corpus so the
    * pairwise stage stays N·(N/k); the internal default routes
    * through `Similarity.kmeansAuto`, which picks flat k-means below
    * the measured N·k crossover and the log-depth `kmeansTree`
    * (N·O(log k) assignment kernels, no driver-model k cap) above it
    * — so corpus-proportional k neither re-creates the quadratic
    * assignment the second scaling decade caught here nor trips
    * flat's k ≤ 65536 model gate. */
  def dedup(embeddings: DataFrame, k: Int, iters: Int, minCos: Double,
      precomputed: Option[DataFrame] = None,
      maxClusterSize: Option[Int] = None): DataFrame = {
    // pin the assignment: it feeds three plan branches (both sides of
    // the candidate self-join and the anti-join probe), and without a
    // pin each branch would re-run the corpus-wide argmax pass (the
    // Components/kmeans pin pattern; harnesses sweep pins per query)
    val assign0 = precomputed.getOrElse(
      Similarity.kmeansAuto(embeddings, k, iters).localCheckpoint())
    val assign = maxClusterSize match {
      case Some(cap) => resplitOversized(embeddings, assign0, cap, iters)
      case None => assign0
    }
    val m = embeddings.select(col("vec_id"), col("embedding"))
      .join(assign, "vec_id")
    val dropped = candidateDrops(m, minCos)
    m.join(dropped, Seq("vec_id"), "left_anti").select("vec_id", "cluster")
  }

  /** Split every cluster above `cap` with a sub-k-means over its own
    * members until none remains (or a bounded depth, for the
    * pathological all-identical-vectors mass that no centroid can
    * separate). Returns a full (vec_id, cluster) re-assignment;
    * sub-cluster labels are FRESH longs past every vec_id — k-means
    * labels are seed vec_ids, and a seed of one top-level cluster can
    * be a MEMBER of another, so reusing sub-seed ids as labels could
    * collide with a surviving top-level label.
    *
    * Scale shape (vectorized round 17 — the earlier version ran one
    * sub-k-means PER hot cluster from a sequential driver loop, which
    * made the backstop itself the bottleneck when many clusters ran
    * hot): every round handles ALL hot clusters in one pass, exactly
    * like kmeansTwoLevel's fine stage — per-cluster seeds come from
    * one row_number window over the hot members, per-round Lloyd
    * iterations are one broadcast join on the cluster key (each
    * member meets only its own cluster's sub-centroids) plus one
    * (cluster, label, dim) mean aggregation. Per-cluster fan-out is
    * clamped to 64 sub-clusters per round, so the seed broadcast is
    * bounded by 64 × hot clusters per round and EXTREME skew resolves
    * through recursion depth (64^d fan-out across d ≤ 16 rounds)
    * rather than through an unbounded broadcast. A cluster still
    * above cap after the depth bound keeps its size (the
    * all-identical-vectors mass, where finer centroids cannot
    * separate anything and near-dup pruning is the point anyway). */
  private[graft] def resplitOversized(embeddings: DataFrame,
      assign0: DataFrame, cap: Int, iters: Int): DataFrame = {
    require(cap > 1, s"need maxClusterSize > 1 (got $cap)")
    val spark = embeddings.sparkSession
    import scala.jdk.CollectionConverters._
    val points = embeddings.select(col("vec_id"), col("embedding"))
    var assign = assign0
    // fresh labels start past every possible seed label (= vec_id);
    // computed LAZILY — the common case has no oversized cluster and
    // must not pay a corpus pass (and an empty frame has no max)
    var nextLabel = -1L
    var depth = 0
    def oversized(): Seq[(Long, Long)] =
      assign.groupBy("cluster").agg(count(lit(1)).as("n"))
        .where(col("n") > cap)
        .select(col("cluster").cast("long"), col("n")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
        .sortBy(_._1) // collect order is plan-dependent; labels must not be
    var hot = oversized()
    // only free pins THIS loop created: round 1's `assign` is the
    // caller's (possibly shared precomputed) assignment
    var owned = false
    while (hot.nonEmpty && depth < 16) {
      depth += 1
      if (nextLabel < 0) {
        val m = points.agg(max(col("vec_id")).cast("long")).head()
        nextLabel = (if (m.isNullAt(0)) 0L else m.getLong(0)) + 1
      }
      // driver-side per-cluster plan: fan-out (clamped) and a disjoint
      // fresh-label base per hot cluster — `hot` is at most the
      // current cluster count, already collected by oversized()
      val plan = hot.zipWithIndex.map { case ((c, n), ord) =>
        val subK = math.max(2L, math.min(64L, (n + cap - 1) / cap))
        (c, subK, nextLabel + ord.toLong * 64L)
      }
      nextLabel += hot.size.toLong * 64L
      val planDf = broadcast(spark.createDataFrame(
        plan.map(p => org.apache.spark.sql.Row(p._1, p._2, p._3)).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("cluster",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("__subk",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("__lbase",
            org.apache.spark.sql.types.LongType)))))
      val assignL = assign.select(col("vec_id"),
        col("cluster").cast("long").as("cluster"))
      val keep = assignL.join(broadcast(planDf.select("cluster")),
        Seq("cluster"), "left_anti")
        .select(col("vec_id"), col("cluster"))
      // hot members, pinned once per round: feed the seed window, every
      // Lloyd pass, and the mean recompute
      val members = points.join(assignL, "vec_id")
        .join(broadcast(planDf.select("cluster")), "cluster")
        .localCheckpoint()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cluster").orderBy("vec_id")
      var cents = members.withColumn("__rn", row_number().over(w))
        .join(planDf, "cluster")
        .where(col("__rn") <= col("__subk"))
        .select(col("cluster"),
          (col("__lbase") + col("__rn") - 1).as("label"),
          transform(col("embedding"), _.cast("double")).as("cent"))
        .localCheckpoint()
      def assignF(c: DataFrame): DataFrame = members
        .join(broadcast(c), "cluster") // each member × its own sub-seeds
        .groupBy("vec_id")
        .agg(max_by(col("label"),
          struct(round(Similarity.cosine(col("embedding"), col("cent")), 9)
            .as("s"), (-col("label")).as("tie"))).as("label"),
          first(col("cluster")).as("cluster"))
      for (_ <- 0 until iters) {
        val dims = assignF(cents)
          .join(members.select(col("vec_id"), col("embedding")), "vec_id")
          .select(col("cluster"), col("label"),
            posexplode(col("embedding")).as(Seq("pos", "x")))
          .groupBy("cluster", "label", "pos")
          .agg(avg(col("x").cast("double")).as("m"))
          .groupBy("cluster", "label")
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            _.getField("m")).as("cent"))
        // a sub-centroid that lost every member keeps its seed vector
        val next = cents.select(col("cluster"), col("label"),
            col("cent").as("_prev"))
          .join(dims, Seq("cluster", "label"), "left")
          .select(col("cluster"), col("label"),
            coalesce(col("cent"), col("_prev")).as("cent"))
          .localCheckpoint()
        graft.Pins.free(cents)
        cents = next
      }
      val sub = assignF(cents).select(col("vec_id"),
        col("label").as("cluster"))
      val next = keep.unionByName(sub).localCheckpoint()
      graft.Pins.free(cents)
      graft.Pins.free(members)
      if (owned) graft.Pins.free(assign)
      owned = true
      assign = next
      val prevSizes = hot.map(_._2).sorted
      hot = oversized()
      // an unseparable mass (identical vectors) reproduces the same
      // oversized multiset every round — stop at the first round that
      // made no progress instead of burning the whole depth budget on
      // clusters no centroid can split
      if (hot.map(_._2).sorted == prevSizes) hot = Nil
    }
    assign
  }

  /** The drop set for an already-clustered frame of
    * (vec_id, embedding, cluster): every vector with a lower-id
    * clustermate at/above the threshold. Exposed so the correctness
    * query can re-derive drops from the same assignment. */
  private[graft] def candidateDrops(members: DataFrame,
      minCos: Double): DataFrame = {
    val w = members.select(col("cluster"),
      col("vec_id").as("__w"), col("embedding").as("__wv"))
    val d = members.select(col("cluster"),
      col("vec_id").as("__d"), col("embedding").as("__dv"))
    w.join(d, "cluster")
      .where(col("__w") < col("__d") &&
        round(Similarity.cosine(col("__wv"), col("__dv")), 9) >= minCos)
      .select(col("__d").as("vec_id")).distinct()
  }
}
