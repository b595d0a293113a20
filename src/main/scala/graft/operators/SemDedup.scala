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
  * bounded as the corpus grows.
  */
object SemDedup {

  /** Survivors of semantic dedup: (vec_id, cluster). Pass
    * `precomputed` to reuse an existing k-means assignment (e.g. one
    * shared with cluster-balanced sampling) instead of clustering
    * again — `Similarity.kmeans` is deterministic, so the result is
    * identical either way. */
  def dedup(embeddings: DataFrame, k: Int, iters: Int, minCos: Double,
      precomputed: Option[DataFrame] = None): DataFrame = {
    // pin the assignment: it feeds three plan branches (both sides of
    // the candidate self-join and the anti-join probe), and without a
    // pin each branch would re-run the corpus-wide argmax pass (the
    // Components/kmeans pin pattern; harnesses sweep pins per query)
    val assign = precomputed.getOrElse(
      Similarity.kmeans(embeddings, k, iters).localCheckpoint())
    val m = embeddings.select(col("vec_id"), col("embedding"))
      .join(assign, "vec_id")
    val dropped = candidateDrops(m, minCos)
    m.join(dropped, Seq("vec_id"), "left_anti").select("vec_id", "cluster")
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
