package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** AsOfJoin vs an independent in-memory argmax on arbitrary data:
  * random keys (including keys present on only one side), clustered
  * times (forcing equal-time ties resolved by the tie-break id), and
  * empty sides. The operator's union-tag + running-last must agree
  * with the obvious quadratic definition on every input.
  */
class AsOfJoinPropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // (key, time) pairs over a small domain so collisions actually occur
  private val genPairs: Gen[List[(Long, Long)]] =
    Gen.listOf(for {
      k <- Gen.choose(1L, 4L)
      t <- Gen.choose(0L, 12L)
    } yield (k, t))

  private def expected(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long, Double)]): Map[Long, Option[(Long, Double)]] =
    left.map { case (k, t, lid) =>
      lid -> right.filter(r => r._2 == k && r._3 <= t)
        .sortBy(r => (r._3, r._1)).lastOption.map(r => (r._1, r._4))
    }.toMap

  test("as-of join equals the quadratic argmax on arbitrary inputs") {
    import spark.implicits._
    val p = Prop.forAll(genPairs, genPairs) { (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val right = rs.zipWithIndex.map { case ((k, t), i) =>
        (i.toLong, k, t, i * 0.5)
      }
      val leftDf = left.toDF("k", "t", "lid")
        .select(col("k"), timestamp_seconds(col("t")).as("t"), col("lid"))
      val rightDf = right.toDF("rid", "k", "t", "v")
        .select(col("rid"), col("k"), timestamp_seconds(col("t")).as("t"),
          col("v"))
      val got = AsOfJoin.asOf(leftDf, rightDf, Seq("k"), "t", "t",
          payload = Seq("rid", "v"), tieBreak = Some("rid"))
        .collect()
        .map(r => r.getLong(2) ->
          (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getDouble(4)))))
        .toMap
      val want = expected(left, right)
      if (got != want) {
        println(s"left=$left right=$right\n got=$got\nwant=$want")
        false
      } else true
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), p)
    assert(res.passed, res.status.toString)
  }
}
