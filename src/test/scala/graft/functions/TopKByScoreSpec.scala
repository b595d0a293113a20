package graft.functions

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bounded-heap top-k aggregate must be indistinguishable from the
  * window-rank idiom it replaces — same rows, same ranks, same order —
  * while reducing map-side instead of shuffling every candidate. The
  * equivalence is exercised across many partitions so partial heaps
  * really serialize, ship, and merge. */
class TopKByScoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Seeded synthetic (g, id, score) rows with deliberate score ties
    * inside groups, spread over 13 partitions to force partial merges. */
  private def candidates(n: Int): DataFrame = {
    val rnd = new scala.util.Random(42)
    (0 until n).map { i =>
      (rnd.nextInt(7).toLong, i.toLong, (rnd.nextInt(50) / 10.0))
    }.toDF("qid", "cid", "sim").repartition(13)
  }

  private def windowed(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("cid"))
    df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("qid", "cid", "rank", "sim")
  }

  private def heaped(df: DataFrame, k: Int): DataFrame =
    df.groupBy("qid")
      .agg(TopKByScore(col("sim"), col("cid"), k).as("nn"))
      .select(col("qid"), posexplode(col("nn")))
      .select(col("qid"), col("col.id").as("cid"),
        (col("pos") + lit(1)).as("rank"), col("col.score").as("sim"))

  test("aggregate equals the window form row-for-row, ties and all") {
    val df = candidates(5000)
    for (k <- Seq(1, 5, 17)) {
      val a = heaped(df, k).orderBy("qid", "rank").collect().toSeq
      val b = windowed(df, k).orderBy("qid", "rank").collect().toSeq
      assert(a === b, s"diverged at k=$k")
    }
  }

  test("k larger than the group returns the whole group, ordered") {
    val df = Seq((1L, 10L, 0.5), (1L, 11L, 0.9), (2L, 12L, 0.1))
      .toDF("qid", "cid", "sim")
    val got = heaped(df, 100).orderBy("qid", "rank").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq ===
      Seq((1L, 11L, 1), (1L, 10L, 2), (2L, 12L, 1)))
  }

  test("null scores and ids are skipped, not ranked") {
    val df = Seq(
      (1L, Some(10L), Some(0.5)), (1L, Some(11L), None),
      (1L, None, Some(0.9)), (1L, Some(12L), Some(0.7)))
      .toDF("qid", "cid", "sim")
      .select(col("qid"), col("cid"), col("sim"))
    val got = heaped(df, 10).orderBy("rank").collect()
    assert(got.map(_.getLong(1)).toSeq === Seq(12L, 10L))
  }

  test("registered SQL function top_k_by agrees with the Column API") {
    graft.GraftFunctions.register(spark)
    candidates(1000).createOrReplaceTempView("topk_cands")
    val viaSql = spark.sql(
      """SELECT qid, nn.id AS cid, CAST(pos + 1 AS INT) AS rank, nn.score AS sim
        |FROM (SELECT qid, top_k_by(sim, cid, 3) AS nns FROM topk_cands GROUP BY qid)
        |LATERAL VIEW posexplode(nns) AS pos, nn
        |ORDER BY qid, rank""".stripMargin).collect().toSeq
    val viaCol = heaped(candidates(1000), 3)
      .orderBy("qid", "rank").collect().toSeq
    assert(viaSql === viaCol)
  }

  test("sort-based aggregation fallback produces identical results") {
    // ObjectHashAggregate falls back to sort-based aggregation past a
    // group-count threshold — the path a 100 TB run with many query
    // groups actually exercises. Force it low and require identical
    // output (serialize/merge must be order-insensitive).
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prev = spark.conf.get(key)
    val df = candidates(4000)
    val normal = heaped(df, 7).orderBy("qid", "rank").collect().toSeq
    try {
      spark.conf.set(key, "2")
      val fallback = heaped(df, 7).orderBy("qid", "rank").collect().toSeq
      assert(fallback === normal)
    } finally spark.conf.set(key, prev)
  }

  test("the ANN plan aggregates partially map-side instead of window-sorting") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val plan = graft.operators.Similarity
      .bruteForceTopK(emb.where(col("vec_id") < 5), emb, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"no partial agg in:\n$plan")
    assert(!plan.contains("Window"), s"window survived in:\n$plan")
  }
}
