package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** RangeJoin.binned vs the plain cross-join inequality definition on
  * arbitrary inputs: random probe times and ranges of random widths —
  * including degenerate (start == end), inverted (start > end → empty),
  * and multi-bin-spanning intervals — at several bin widths. The
  * bucketed plan must produce exactly the naive pair set.
  */
class RangeJoinPropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val genProbe: Gen[List[Long]] =
    Gen.listOf(Gen.choose(0L, 40L))
  private val genRanges: Gen[List[(Long, Long)]] =
    Gen.listOf(for {
      s <- Gen.choose(0L, 40L)
      w <- Gen.choose(-3L, 25L) // negative width = inverted, empty range
    } yield (s, s + w))

  test("binned range join equals the naive inequality join on arbitrary inputs") {
    import spark.implicits._
    val p = Prop.forAll(genProbe, genRanges, Gen.oneOf(1, 3, 16)) {
      (probes, ranges, binDays) =>
        val left = probes.zipWithIndex.map { case (d, i) => (i.toLong, d) }
        val rs = ranges.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        val leftDf = left.toDF("pid", "d")
          .select(col("pid"), timestamp_seconds(col("d") * 86400).as("pt"))
        val rDf = rs.toDF("rid", "s", "e")
          .select(col("rid"), timestamp_seconds(col("s") * 86400).as("s"),
            timestamp_seconds(col("e") * 86400).as("e"))
        // inverted ranges need no special casing: sequence() descends,
        // and the residual BETWEEN filter makes their pair set empty
        val got = RangeJoin.binned(leftDf, col("pt"), rDf,
          col("s"), col("e"), binDays)
        val gotSet = got.select("pid", "rid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = (for {
          (pid, d) <- left
          (rid, s, e) <- rs
          if d >= s && d <= e
        } yield (pid, rid)).toSet
        if (gotSet != want) {
          println(s"probes=$left ranges=$rs bin=$binDays\n got=$gotSet\nwant=$want")
          false
        } else true
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), p)
    assert(res.passed, res.status.toString)
  }
}
