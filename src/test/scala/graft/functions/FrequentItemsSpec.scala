package graft.functions

import scala.util.Random

import graft.TestSpark
import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Misra–Gries frequent-items aggregate (`freq_items`) and the
  * HeavyHitters operator over it. Wall-clock-free and deterministic
  * assertions only: exactness when capacity covers the item space,
  * and the MG guarantees (superset of the hot set, one-sided error
  * within N/(m+1)) under adversarial repartitioning — the bounds must
  * hold for ANY input order and merge order.
  */
class FrequentItemsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("capacity >= distinct count: estimates are exact, any partitioning") {
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(9)("c")
    for (parts <- Seq(1, 3, 17)) {
      val df = items.toDF("item").repartition(parts)
      val got = HeavyHitters.frequentItems(df, col("item"), m = 8)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == Seq(("a", 40L), ("b", 25L), ("c", 9L)), s"parts=$parts")
    }
  }

  test("MG guarantees hold under random data and random repartitioning") {
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      // skewed universe: item i drawn with weight ~ 1/(i+1)
      val universe = 50
      val items = Seq.fill(3000) {
        val u = rnd.nextDouble()
        var acc = 0.0
        val z = (0 until universe).map(i => 1.0 / (i + 1)).sum
        var pick = 0
        var i = 0
        var done = false
        while (i < universe && !done) {
          acc += 1.0 / (i + 1) / z
          if (u <= acc) { pick = i; done = true }
          i += 1
        }
        s"it_$pick"
      }
      val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val n = items.size.toLong
      val m = 10
      val df = items.toDF("item").repartition(1 + rnd.nextInt(13))
      val sketch = HeavyHitters.frequentItems(df, col("item"), m)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(sketch.size <= m, s"trial $trial: ${sketch.size} > $m counters")
      val bound = n / (m + 1)
      // one-sided error: est <= f, f - est <= N/(m+1) (absent => 0)
      exact.foreach { case (t, f) =>
        val est = sketch.getOrElse(t, 0L)
        assert(est <= f, s"trial $trial: overcount $t est=$est f=$f")
        assert(f - est <= bound,
          s"trial $trial: undercount $t est=$est f=$f bound=$bound")
      }
      // superset: every item with f > N/(m+1) is present
      exact.filter(_._2 > bound).keys.foreach { t =>
        assert(sketch.contains(t), s"trial $trial: hot item $t missing")
      }
      // no phantom items
      sketch.keys.foreach(t => assert(exact.contains(t), s"phantom $t"))
    }
  }

  test("hotReport rows are exact counts with provably-TRUE verdicts") {
    val items = Seq.fill(60)("x") ++ Seq.fill(30)("y") ++
      (1 to 30).map(i => s"noise_$i")
    val df = items.toDF("tok").repartition(7)
    val rep = HeavyHitters.hotReport(df, col("tok"), m = 5).collect()
    // N = 120, bound share 1/6 = 20: hot = x (60), y (30)
    assert(rep.map(_.getString(0)).toSeq == Seq("x", "y"))
    assert(rep.map(_.getLong(1)).toSeq == Seq(60L, 30L))
    assert(rep.forall(_.getBoolean(2)), "in_sketch must be TRUE for hot items")
    assert(rep.forall(_.getBoolean(3)), "est_ok must be TRUE for hot items")
  }

  test("freq_items registers as a SQL aggregate; nulls are skipped") {
    graft.GraftFunctions.register(spark)
    Seq(Some("a"), Some("a"), None, Some("b")).toDF("t")
      .createOrReplaceTempView("fi_in")
    val rows = spark.sql(
      "SELECT freq_items(t, 4) AS s FROM fi_in").collect()
    val arr = rows.head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(arr == Seq(("a", 2L), ("b", 1L)))
  }

  test("the sketch plan aggregates partially map-side (the scale claim)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = HeavyHitters.frequentItems(
        docs.select(explode(split(col("text"), " ")).as("tok")),
        col("tok"), m = 15)
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate with partial_freq_items: each input partition
    // reduces to <= m counters BEFORE the exchange — the whole point vs
    // shuffling the full token keyspace
    assert(plan.contains("ObjectHashAggregate"), s"no object agg in:\n$plan")
    assert(plan.contains("partial_freq_items"), s"no partial agg in:\n$plan")
  }

  test("per-group aggregation keeps summaries independent") {
    val df = (Seq.fill(20)(("g1", "a")) ++ Seq.fill(3)(("g1", "b")) ++
      Seq.fill(15)(("g2", "c"))).toDF("g", "item").repartition(5)
    val got = df.groupBy("g").agg(FrequentItems(col("item"), 4).as("s"))
      .select(col("g"), explode(col("s")).as("e"))
      .select(col("g"), col("e.item"), col("e.est"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("g1", "a", 20L), ("g1", "b", 3L), ("g2", "c", 15L)))
  }
}
