package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: pair each left row with every
  * range whose [start, end] contains the left row's time.
  *
  * The reference has no range join ([REF-GAP] — SURVEY §2.3); Spark
  * plans a pure inequality join as BroadcastNestedLoop (fine only when
  * one side broadcasts) or, worse, a cartesian product. The scalable
  * shape is bin bucketing: quantize time into fixed-width bins, emit
  * each range once per bin it covers, give each left row its single
  * bin, equi-join on the bin, then apply the exact BETWEEN as a
  * residual filter. One shuffle, |R| inflated only by
  * ceil(width/bin)+1, and each (left, range) pair meets exactly once
  * (the left row owns one bin), so no dedup pass is needed.
  */
object RangeJoin {

  /** @param leftTime timestamp column of the probe side
    * @param start/end inclusive range bounds (timestamp columns)
    * @param binDays  bin width in days — choose >= the typical range
    *                 width so ranges emit ~2 bin rows each */
  def binned(left: DataFrame, leftTime: Column, ranges: DataFrame,
      start: Column, end: Column, binDays: Int): DataFrame = {
    require(binDays > 0, "binDays must be positive")
    val width = lit(86400L * binDays)
    def binOf(c: Column): Column = floor(unix_timestamp(c) / width).cast("long")
    val rBinned = ranges.withColumn("_rj_bin",
      explode(sequence(binOf(start), binOf(end))))
    val lBinned = left.withColumn("_rj_bin", binOf(leftTime))
    lBinned.join(rBinned, Seq("_rj_bin"))
      .where(leftTime >= start && leftTime <= end)
      .drop("_rj_bin")
  }
}
