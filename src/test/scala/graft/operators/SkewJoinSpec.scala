package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted skew join: exact join semantics (inner + left, unmatched
  * keys included), and the shuffle really is on (key, salt) when the
  * join shuffles — that is the whole point of the operator.
  */
class SkewJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  test("salted join equals the plain join, inner and left") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_partkey")
      .where(col("l_orderkey") < 3000)
    val dim = spark.read.parquet(s"$sfDir/part.parquet")
      .where(col("p_partkey") < 1500) // some fact keys miss → left-join nulls
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    for (jt <- Seq("inner", "left")) {
      val plain = li.join(dim, Seq("l_partkey"), jt)
      val salted = SkewJoin.saltedJoin(li, dim, "l_partkey", salts = 8, joinType = jt)
      assert(salted.count() === plain.count(), jt)
      assert(plain.exceptAll(salted).count() === 0L, s"$jt: plain rows missing")
      assert(salted.exceptAll(plain).count() === 0L, s"$jt: extra salted rows")
    }
  }

  test("salts=1 degenerates to the plain join; bad salts rejected") {
    import spark.implicits._
    val f = Seq((1L, "x"), (2L, "y")).toDF("k", "fv")
    val d = Seq((1L, "a")).toDF("k", "dv")
    assert(SkewJoin.saltedJoin(f, d, "k", 1).collect().toSeq
      === f.join(d, Seq("k")).collect().toSeq)
    intercept[IllegalArgumentException] { SkewJoin.saltedJoin(f, d, "k", 0) }
  }

  test("when the join shuffles, the shuffle key carries the salt") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    val dim = spark.read.parquet(s"$sfDir/part.parquet")
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    // suppress broadcast so the plan shows the real shuffle shape
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = SkewJoin.saltedJoin(li, dim, "l_partkey", 8)
        .queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), s"salt missing from the physical plan:\n$plan")
      assert(plan.contains("hashpartitioning(l_partkey"),
        "join did not hash-partition on the salted key")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
