package graft.operators

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AsOfJoin and RangeJoin verified against brute-force formulations
  * (inequality join + argmax / plain inequality join) on data that
  * exercises the edge cases: equal-time ties, rows with no match,
  * boundary inclusivity, and ranges spanning multiple bins.
  */
class AsOfRangeJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("as-of join matches brute-force argmax, ties broken by tieBreak") {
    // right: (key, t, id, v) — includes two rows at the same (key, t)
    val right = Seq(
      (1L, 10L, 100L, "a"), (1L, 20L, 101L, "b"), (1L, 20L, 102L, "c"),
      (2L, 5L, 200L, "x"), (3L, 99L, 300L, "z"))
      .toDF("k", "t", "id", "v")
      .select(col("k"), timestamp_seconds(col("t")).as("t"), col("id"), col("v"))
    // left: exact-time hit (inclusive), between, before-any, unknown key
    val left = Seq((1L, 20L, 1L), (1L, 15L, 2L), (2L, 4L, 3L), (7L, 50L, 4L))
      .toDF("k", "t", "lid")
      .select(col("k"), timestamp_seconds(col("t")).as("t"), col("lid"))
    val got = AsOfJoin.asOf(left, right, Seq("k"), "t", "t",
      payload = Seq("id", "v"), tieBreak = Some("id"))
    // brute force: inner-join all pairs with r.t <= l.t, keep the max
    // (r.t, r.id) per left row, then re-attach matchless left rows
    val r2 = right.select(col("k"), col("t").as("rt"), col("id"), col("v"))
    val best = left.join(r2, Seq("k"))
      .where(col("rt") <= col("t"))
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("lid").orderBy(col("rt").desc, col("id").desc)))
      .where(col("_rk") === 1)
      .select(col("lid"), col("id").as("asof_id"), col("v").as("asof_v"))
    val brute = left.join(best, Seq("lid"), "left")
      .select(col("k"), col("t"), col("lid"), col("asof_id"), col("asof_v"))
    assert(sorted(got) === sorted(brute))
    // spot-check semantics: lid=1 ties at t=20 -> id 102 wins (tieBreak)
    val m = got.collect().map(r => r.getLong(2) -> Option(r.get(3))).toMap
    assert(m(1L) === Some(102L)) // inclusive + highest id at equal t
    assert(m(2L) === Some(100L)) // latest at-or-before 15
    assert(m(3L) === None) // before any right row
    assert(m(4L) === None) // unknown key
  }

  test("binned range join equals the plain inequality join") {
    // ranges: short, exactly-one-bin, multi-bin (width 40 > 2 bins of 16d),
    // and an empty one far away
    def ts(day: Long) = timestamp_seconds(lit(day * 86400L))
    val ranges = Seq((1L, 0L, 10L), (2L, 14L, 30L), (3L, 5L, 45L), (4L, 500L, 510L))
      .toDF("rid", "s", "e")
      .select(col("rid"), timestamp_seconds(col("s") * 86400).as("s"),
        timestamp_seconds(col("e") * 86400).as("e"))
    val probes = Seq((10L, 0L), (11L, 10L), (12L, 11L), (13L, 22L), (14L, 45L), (15L, 46L))
      .toDF("pid", "d")
      .select(col("pid"), timestamp_seconds(col("d") * 86400).as("pt"))
    val got = RangeJoin.binned(probes, col("pt"), ranges, col("s"), col("e"), binDays = 16)
      .select("pid", "rid")
    val brute = probes.crossJoin(ranges)
      .where(col("pt") >= col("s") && col("pt") <= col("e"))
      .select("pid", "rid")
    assert(sorted(got) === sorted(brute))
    // boundary inclusivity on both ends
    val pairs = got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((10L, 1L)) && pairs.contains((11L, 1L))) // s and e hit
    assert(pairs.contains((14L, 3L)) && !pairs.contains((15L, 3L)))
    assert(!pairs.exists(_._2 == 4L)) // empty range pairs with nothing
  }
}
