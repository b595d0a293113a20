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
    * At scale (round 17, SCALE.md): size k ∝ corpus so the pairwise
    * stage stays N·(N/k), and pass a `Similarity.kmeansTwoLevel`
    * assignment as `precomputed` — the internal default here is FLAT
    * k-means, whose N·k assignment is itself quadratic once k grows
    * with the corpus (the exact trap the second scaling decade
    * caught in q_semdedup). */
  def dedup(embeddings: DataFrame, k: Int, iters: Int, minCos: Double,
      precomputed: Option[DataFrame] = None,
      maxClusterSize: Option[Int] = None): DataFrame = {
    // pin the assignment: it feeds three plan branches (both sides of
    // the candidate self-join and the anti-join probe), and without a
    // pin each branch would re-run the corpus-wide argmax pass (the
    // Components/kmeans pin pattern; harnesses sweep pins per query)
    val assign0 = precomputed.getOrElse(
      Similarity.kmeans(embeddings, k, iters).localCheckpoint())
    val assign = maxClusterSize match {
      case Some(cap) => resplitOversized(embeddings, assign0, cap, iters)
      case None => assign0
    }
    val m = embeddings.select(col("vec_id"), col("embedding"))
      .join(assign, "vec_id")
    val dropped = candidateDrops(m, minCos)
    m.join(dropped, Seq("vec_id"), "left_anti").select("vec_id", "cluster")
  }

  /** Recursively split every cluster above `cap` with a sub-k-means
    * over its own members until none remains (or a bounded depth, for
    * the pathological all-identical-vectors mass that no centroid can
    * separate). Returns a full (vec_id, cluster) re-assignment;
    * sub-cluster labels are FRESH longs from a driver-side counter —
    * k-means labels are seed vec_ids, and a seed of one top-level
    * cluster can be a MEMBER of another, so reusing sub-seed ids as
    * labels could collide with a surviving top-level label.
    *
    * Scale shape: the oversized set is at most (current cluster
    * count) rows, collected driver-side; each hot cluster costs one
    * membership semi-join plus its own kmeans (broadcast-argmax
    * rounds over cap-bounded members). Hot clusters are few by
    * construction — k is chosen so the EXPECTED cluster is far under
    * cap — so the driver loop is short. Stated honestly (round 17,
    * measured): the loop is SEQUENTIAL per hot cluster, so it is a
    * skew BACKSTOP, not a substitute for sizing k — running it with
    * every cluster hot (fixed small k on a grown corpus) costs
    * several Spark job rounds per cluster and dominated the sf1
    * semdedup sample at ~6× the uncapped time. Size k ∝ corpus so the
    * cap only catches genuine skew tails; a cluster still above cap
    * after the depth bound keeps its size (pairwise for that cluster
    * is then unbounded — the all-identical-vectors mass where finer
    * centroids cannot separate anything and near-dup pruning is the
    * point anyway). */
  private[graft] def resplitOversized(embeddings: DataFrame,
      assign0: DataFrame, cap: Int, iters: Int): DataFrame = {
    require(cap > 1, s"need maxClusterSize > 1 (got $cap)")
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
      val spark = embeddings.sparkSession
      import scala.jdk.CollectionConverters._
      val keep = assign
        .where(!col("cluster").isInCollection(hot.map(_._1)))
      val pieces = hot.map { case (c, n) =>
        val subK = math.max(2, ((n + cap - 1) / cap).toInt)
        val members = points.join(
          assign.where(col("cluster") === c).select("vec_id"), "vec_id")
        val sub = Similarity.kmeans(members, subK, iters).localCheckpoint()
        // relabel: distinct sub labels are <= subK rows (bounded)
        val labels = sub.select(col("cluster").cast("long")).distinct()
          .collect().map(_.getLong(0)).sorted
        val mapping = labels.map { l => val f = nextLabel; nextLabel += 1
          (l, f) }.toMap
        val mapDf = broadcast(spark.createDataFrame(
          mapping.toSeq.sortBy(_._1).map(p =>
            org.apache.spark.sql.Row(p._1, p._2)).asJava,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("__old",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("__new",
              org.apache.spark.sql.types.LongType)))))
        val out = sub.join(mapDf, col("cluster").cast("long") === col("__old"))
          .select(col("vec_id"), col("__new").as("cluster"))
        (sub, out)
      }
      val next = (keep.select(col("vec_id"), col("cluster").cast("long")
          .as("cluster")) +: pieces.map(_._2))
        .reduce(_ unionByName _).localCheckpoint()
      pieces.foreach(p => graft.Pins.free(p._1))
      if (owned) graft.Pins.free(assign)
      owned = true
      assign = next
      hot = oversized()
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
