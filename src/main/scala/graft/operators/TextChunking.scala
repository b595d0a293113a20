package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking and PII redaction — training-pipeline stages the
  * reference does not have ([REF-GAP]; its fulltext.rs tokenizes but
  * never re-segments documents). Both are pure column-expression
  * trees: chunking is a generator over computed offsets (the 100 TB
  * cost is the explode, linear in output tokens, no shuffle at all
  * until the consumer asks for one), redaction is codegen'd
  * regexp_replace.
  */
object TextChunking {

  /** Split each document's whitespace tokens into fixed-size chunks of
    * `chunkTokens` with `overlap` tokens shared between consecutive
    * chunks — the standard pretraining windowing. Emits
    * (all input columns, chunk_id, chunk, n_tokens); a document
    * shorter than one chunk yields exactly one chunk. Chunk starts
    * step by `chunkTokens - overlap`; the final partial chunk keeps
    * its tail (n_tokens < chunkTokens), and a start is only emitted
    * while it contributes at least one NEW token (start + overlap <
    * len) — without that bound, a tail landing within `overlap` of
    * the end yields a chunk wholly contained in its predecessor
    * (duplicate training tokens). */
  def chunk(docs: DataFrame, textCol: Column, chunkTokens: Int,
      overlap: Int): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got overlap=$overlap chunk=$chunkTokens")
    val step = chunkTokens - overlap
    docs
      .withColumn("_ck_toks", split(textCol, " "))
      // one start offset per chunk: 0, step, 2*step ... <= len-overlap-1
      // (inclusive bound: the last chunk must reach past the previous
      // chunk's coverage; clamped to 0 so an empty/short doc still
      // yields its single chunk)
      .withColumn("_ck_start",
        explode(sequence(lit(0),
          greatest(size(col("_ck_toks")) - (overlap + 1), lit(0)), lit(step))))
      .withColumn("chunk_id", (col("_ck_start") / step).cast("long"))
      .withColumn("chunk",
        array_join(slice(col("_ck_toks"), col("_ck_start") + 1,
          lit(chunkTokens)), " "))
      .withColumn("n_tokens",
        least(lit(chunkTokens), size(col("_ck_toks")) - col("_ck_start")))
      .drop("_ck_toks", "_ck_start")
  }

  // Patterns restricted to the regex subset Java and RE2 agree on
  // (character classes + word boundaries, no lookaround) so the same
  // redaction is expressible in any engine.
  val EmailPattern = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val PhonePattern = """\b\d{3}-\d{3}-\d{4}\b"""
  val SsnPattern = """\b\d{3}-\d{2}-\d{4}\b"""

  /** Mask emails, US-style phone numbers, and SSN-shaped ids. Order
    * matters: the SSN shape is a sub-shape of nothing here, but phone
    * (3-3-4) and SSN (3-2-4) are disjoint, so the passes compose. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>"),
      SsnPattern, "<ID>")
}
