package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization — int8 compression of embedding columns
  * (pipeline extension; the reference has no vector surface). At
  * 100 TB scale the embedding table is often the largest artifact a
  * curation pipeline carries; symmetric int8 cuts it 4× with a bounded
  * reconstruction error, and similarity search over the codes is how
  * IVF/PQ systems scale.
  *
  * Symmetric per-vector scheme: `scale = max|v| / 127`,
  * `code_i = clamp(floor(v_i/scale + 0.5), -127, 127)` — round-half-up
  * written as an explicit floor so every engine computes the identical
  * integer (SQL ROUND half-away/half-even behavior differs across
  * engines; floor does not). Dequantization is `code_i · scale`, with
  * `|v_i − code_i·scale| ≤ scale/2` by construction.
  *
  * 100 TB shape: pure per-row array arithmetic in the scan stage — no
  * shuffle, no UDF, everything codegen'd `functions` higher-order
  * ops. All-zero vectors quantize to all-zero codes with scale 0.
  */
object Quantize {

  /** `max|v|/127` over the (double-cast) embedding — the per-vector
    * symmetric scale factor. */
  def int8Scale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double")))) / lit(127.0d)

  /** Int8 codes as an array<long> (kept integral; the storage cast to
    * byte is lossless once clamped). Zero-scale (all-zero) vectors
    * code to zero. */
  def int8Codes(vec: Column): Column = {
    val s = int8Scale(vec)
    transform(vec, x =>
      when(s === lit(0.0d), lit(0L)).otherwise(
        greatest(lit(-127L), least(lit(127L),
          floor(x.cast("double") / s + lit(0.5d)).cast("long")))))
  }

  /** Quantize `df`'s embedding column: adds `codes` (array<long>),
    * `scale` (double), and the realized reconstruction error
    * `max_abs_err = max|v_i − code_i·scale|`, which is ≤ scale/2 by
    * construction — the invariant the spec asserts. */
  def int8(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol)
    df.withColumn("codes", int8Codes(v))
      .withColumn("scale", int8Scale(v))
      .withColumn("max_abs_err",
        coalesce(array_max(zip_with(v, col("codes"),
          (x, c) => abs(x.cast("double") - c * col("scale")))), lit(0.0d)))
  }
}
