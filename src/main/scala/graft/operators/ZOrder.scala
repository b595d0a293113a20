package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering (Z-ordering) — the
  * physical-layout half of the reference's segment compaction
  * (engine.rs:739-845 rewrites segments; it has no clustering notion,
  * [REF-GAP]), re-expressed as the lakehouse OPTIMIZE ... ZORDER BY:
  * rewrite files so rows close in a multi-column key space land in the
  * same files, making parquet footer min/max stats selective on EVERY
  * clustered column at once. At 100 TB this is what turns a filtered
  * scan from "read everything" into "skip almost every row group" for
  * the second and third predicate columns — a single-column sort can
  * only serve the first.
  *
  * Method (the standard interleaved-bit construction, cf. the
  * literature on space-filling curves / Morton codes):
  *   1. per clustering column, derive up to 255 range boundaries from
  *      a deterministic, bounded sample (hash-mod filter — no global
  *      sort, no driver blowup: the sample is ~16k rows regardless of
  *      input size);
  *   2. per row, rank-code each column against its boundaries
  *      (8 bits/column, codegen-friendly array ops over a literal
  *      boundary array — no UDF);
  *   3. interleave the code bits into one long (Morton code) and
  *      range-repartition + locally sort by it.
  *
  * A single clustering column skips the encoding entirely: a plain
  * range sort IS the optimal layout for one column.
  */
object ZOrder {

  /** Rank-code bits per clustering column: 256 buckets. */
  val Bits = 8

  /** Bounded size of the per-column boundary sample. */
  val SampleTarget = 16384L

  /** Cluster `df`'s layout by `colNames` into `partitions` output
    * partitions. Content-preserving: same rows, different physical
    * order. Up to 8 columns (8 bits x 8 = the 64-bit Morton code). */
  def cluster(df: DataFrame, colNames: Seq[String], partitions: Int): DataFrame = {
    require(colNames.nonEmpty, "ZORDER BY needs at least one column")
    require(colNames.size <= 8, s"ZORDER BY supports at most 8 columns, got ${colNames.size}")
    if (colNames.size == 1)
      return df.repartitionByRange(partitions, col(colNames.head))
        .sortWithinPartitions(colNames.head)
    // row-content hash for the boundary sample: deterministic for a
    // given dataset, independent of partitioning
    val salt = xxhash64(df.columns.map(col).toIndexedSeq: _*)
    val rows = df.count()
    val codes = colNames.map(c => rankCode(col(c), boundaries(df, col(c), salt, rows)))
    df.withColumn("__zval", interleave(codes))
      .repartitionByRange(partitions, col("__zval"))
      .sortWithinPartitions("__zval")
      .drop("__zval")
  }

  /** Deterministic bounded boundary sample for one column: hash-mod
    * pick ~SampleTarget rows, sort that small set, take 255 evenly
    * spaced values. One column-pruned scan; O(sample) driver memory at
    * any input scale. Works for every orderable type (numerics,
    * strings, dates) — boundaries are compared with the column's own
    * ordering, never cast. */
  private def boundaries(df: DataFrame, c: Column, salt: Column, rows: Long): Seq[Any] = {
    if (rows <= 0L) return Nil
    val modulus = math.max(1L, rows / SampleTarget)
    val sample = df
      .where(c.isNotNull && pmod(xxhash64(salt, c), lit(modulus)) === 0)
      .select(c.as("b")).orderBy(col("b"))
      .collect().map(_.get(0))
    if (sample.isEmpty) Nil
    else {
      val buckets = 1 << Bits
      (1 until buckets)
        .map(i => sample(((i.toLong * sample.length) / buckets).toInt))
        .distinct
    }
  }

  /** Bucket index of `c` against sorted `bounds`: the count of
    * boundaries <= c — a literal-array scan the optimizer keeps inside
    * the projection (no join, no shuffle, no UDF). NULLs sort first
    * (code 0, like NULLS FIRST). */
  private def rankCode(c: Column, bounds: Seq[Any]): Column =
    if (bounds.isEmpty) lit(0L)
    else {
      val arr = array(bounds.map(lit(_)): _*)
      when(c.isNull, lit(0L))
        .otherwise(size(filter(arr, b => c >= b)).cast("long"))
    }

  /** Interleave the low `Bits` bits of each code into one Morton code:
    * bit b of column i lands at position b*n + (n-1-i), so all columns
    * contribute equally at every scale of the curve. */
  private def interleave(codes: Seq[Column]): Column = {
    val n = codes.size
    val terms = for {
      b <- 0 until Bits
      (code, i) <- codes.zipWithIndex
    } yield shiftleft(code.bitwiseAND(lit(1L << b)), b * (n - 1) + (n - 1 - i))
    terms.reduce(_.bitwiseOR(_))
  }
}
