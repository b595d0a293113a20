package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes an N×-scale copy of a fixture dir for the round-level
  * scale audit (SURVEY §8 / SCALE.md): `runMain graft.ScaleGen
  * [srcDir] [outDir] [copies]`.
  *
  * Replication is structure-preserving, not row-cloning — the point is
  * a corpus whose per-copy statistics match the source so measured
  * scaling exponents mean something:
  *   - region/nation stay fixed (TPC-H semantics: dimension cardinality
  *     does not grow with SF);
  *   - customer/supplier/part/orders/lineitem/events replicate with
  *     key offsets (copy i's orders reference copy i's customers), so
  *     join fan-out per key is unchanged while table sizes scale;
  *   - documents namespace every WORD per copy ("c3_the c3_quick ..."):
  *     intra-copy duplicate/near-duplicate structure is exactly the
  *     source's, but no shingle collides across copies — total dup
  *     pairs and LSH candidate sets scale LINEARLY like a genuinely
  *     larger corpus, instead of quadratically like naive row cloning
  *     (10 verbatim copies of each doc would make every doc a 10-way
  *     near-dup cluster and any pairwise stage blow up 45×);
  *   - embeddings apply a deterministic per-copy SIGNED PERMUTATION of
  *     the dimensions (new[j] = sign_i[j] * old[perm_i[j]]). A signed
  *     permutation matrix is orthogonal, so intra-copy inner products,
  *     norms, and hence cosine similarities are preserved EXACTLY —
  *     every copy's neighbor structure is the source's. Cross-copy
  *     similarity is decorrelated (for ~isotropic unit vectors the
  *     expected cosine under a random signed permutation is 0), so
  *     near-neighbor pairs grow linearly with copies. (A translation,
  *     used before round 17, preserves Euclidean distance but NOT
  *     cosine: an offset of norm ~0.35·√d dominates unit vectors.)
  */
object ScaleGen {
  /** Deterministic signed permutation for copy `seed`: a Fisher–Yates
    * shuffle of 1..d (1-based, for `element_at`) plus ±1 signs, both
    * from a seeded PRNG — the matrix it encodes is orthogonal, so the
    * transform preserves inner products exactly. */
  def signedPermutation(d: Int, seed: Int): (Array[Int], Array[Float]) = {
    val rng = new scala.util.Random(0x5ca1e9e0L + seed)
    val perm = rng.shuffle((1 to d).toVector).toArray
    val signs = Array.fill(d)(if (rng.nextBoolean()) 1.0f else -1.0f)
    (perm, signs)
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft-sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    // Always build from the ORIGINAL fixture dir, never stage on an
    // already-synthesized corpus: a second-stage build would collide
    // keys (offsets past the first stage's span) AND word namespaces
    // (stage-2 copy j's prefix of stage-1 copy 0's plain words equals
    // stage-1 copy j's words — "c5_" + "the" == "c5_the"), quietly
    // re-coupling the dup structure the prefixes exist to separate.
    // A 1000-copy single-stage union (the third scaling decade) plans
    // and writes fine.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val M = 10_000_000L // key offset stride per copy
    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(t: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scalegen] $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }
    def replicated(t: String)(f: (DataFrame, Int) => DataFrame): Unit =
      write(t, (0 until copies).map(i => f(read(t), i))
        .reduce(_.unionByName(_)))

    // fixed dimensions
    for (t <- Seq("region", "nation")) write(t, read(t))

    def off(c: String, i: Int) = col(c) + lit(i * M)
    replicated("customer")((df, i) =>
      df.withColumn("c_custkey", off("c_custkey", i)))
    replicated("supplier")((df, i) =>
      df.withColumn("s_suppkey", off("s_suppkey", i)))
    replicated("part")((df, i) =>
      df.withColumn("p_partkey", off("p_partkey", i)))
    replicated("orders")((df, i) =>
      df.withColumn("o_orderkey", off("o_orderkey", i))
        .withColumn("o_custkey", off("o_custkey", i)))
    replicated("lineitem")((df, i) =>
      df.withColumn("l_orderkey", off("l_orderkey", i))
        .withColumn("l_partkey", off("l_partkey", i))
        .withColumn("l_suppkey", off("l_suppkey", i)))
    replicated("events")((df, i) =>
      df.withColumn("event_id", off("event_id", i))
        .withColumn("user_id", off("user_id", i)))
    replicated("documents")((df, i) =>
      if (i == 0) df
      else df
        .withColumn("doc_id", off("doc_id", i))
        .withColumn("text", array_join(
          transform(split(col("text"), " "),
            w => concat(lit(s"c${i}_"), w)), " "))
        .withColumn("n_chars", length(col("text"))))
    val embDim = read("embeddings").selectExpr("size(embedding)")
      .head().getInt(0)
    replicated("embeddings")((df, i) =>
      if (i == 0) df
      else {
        val (perm, signs) = signedPermutation(embDim, seed = i)
        df.withColumn("vec_id", off("vec_id", i))
          .withColumn("embedding",
            zip_with(lit(perm), lit(signs), (p, s) =>
              (element_at(col("embedding"), p) * s).cast("float")))
      })
    println(s"[scalegen] wrote ${copies}x of $src to $out")
    spark.stop()
  }
}
