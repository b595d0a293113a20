package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns plus a typed metadata struct, with decode / feature-extract
  * implemented as per-partition batch transforms.
  *
  * The decode step is a STUB — the container has no image/audio codecs
  * — but everything Spark-side is real: the binary column handling,
  * the metadata schema, the partition-batch execution shape (decode
  * cost amortized per partition, not per row), and the deterministic
  * fake feature extraction used by tests/oracles.
  *
  * At 100 TB the binary payloads dominate storage; the design keeps
  * metadata in columnar form (pruned scans never touch the bytes) and
  * decodes only after pushdown-filtered metadata narrows the rows.
  */
object Multimodal {

  val metadataSchema: StructType = StructType(Seq(
    StructField("modality", StringType),
    StructField("byte_len", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType)))

  /** Attach an opaque binary payload column + typed metadata derived
    * from it. The "decode" producing width/height is the deterministic
    * stub: real codecs would replace the arithmetic, the schema and
    * plumbing stay identical. */
  def withBinaryPayload(df: DataFrame, content: Column, modality: String): DataFrame = {
    val bin = content.cast("binary")
    val len = octet_length(bin).cast("long")
    df.withColumn("payload", bin)
      .withColumn("meta", struct(
        lit(modality).as("modality"),
        len.as("byte_len"),
        // STUB decode: pseudo-dimensions derived from the byte length.
        (pmod(len, lit(640)) + 1).cast("int").as("width"),
        (pmod(len, lit(480)) + 1).cast("int").as("height"),
        lit(16000).as("sample_rate")))
  }

  /** Feature extraction over the binary payload, batched per partition
    * (the shape a real decoder needs: open codec once per partition,
    * stream rows through it). The extracted "feature" is a
    * deterministic stub: (first byte, last byte, byte length). */
  def extractFeatures(df: DataFrame): DataFrame = {
    val schema = StructType(df.schema.fields ++ Array(
      StructField("feat_first", IntegerType),
      StructField("feat_last", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      // per-partition setup would initialize the codec here (once)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val first = if (payload.nonEmpty) payload.head & 0xff else -1
        val last = if (payload.nonEmpty) payload.last & 0xff else -1
        org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(first, last))
      }
    }(enc)
  }

  /** Frame-sampling stub for video-like payloads: split the byte range
    * into `n` equal strides and emit one (offset, length) slice row per
    * frame — the real decoder would emit decoded frames. Pure
    * column-level arithmetic (posexplode over a sequence). */
  def sampleFrames(df: DataFrame, n: Int): DataFrame =
    df.select(col("*"), posexplode(sequence(lit(0), lit(n - 1))).as(Seq("frame_idx", "_f")))
      .drop("_f")
      .withColumn("frame_offset",
        (col("meta.byte_len") * col("frame_idx") / n).cast("long"))
      .withColumn("frame_len", (col("meta.byte_len") / n).cast("long"))
}
