package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter decontamination — the scale path for checking a 100 TB
  * corpus against a bounded reference set (eval benchmarks, a
  * blocklist): build a small bit-filter over the reference set's word
  * n-gram shingles ONCE, then probe every corpus shingle scan-side
  * against the filter riding the plan as one array literal. The corpus
  * is never shuffled, joined, or exploded: the only shuffle in the
  * whole operator is the reference set's own (bounded) shingle
  * aggregation, and the probe is per-row expression work inside the
  * scan stage. False positives are possible by construction (that is
  * the Bloom trade), false negatives are not — exactly the guarantee a
  * decontamination pre-filter needs; `Decontam.contaminated` (the
  * exact-join operator, Pipeline.scala q_decontam) is the precise
  * second stage when hits must be confirmed.
  *
  * Determinism/oracle: bit positions derive from the md5 hex of the
  * shingle via classic double hashing — `h1` = hex[1..8], `h2` =
  * hex[9..16] parsed as integers, probe i at
  * `(h1 + i*(h2|1)) mod mBits` (forcing the stride odd is the
  * standard Kirsch–Mitzenmauer guard: a zero or even stride would
  * collapse the k probes onto one bit or a coset of an even mBits,
  * quietly degrading the promised false-positive rate) — so an oracle
  * can re-derive every position with plain hex-digit arithmetic; no
  * engine-private hash is involved (the reference's engine-level
  * bloom in storage uses a private hash and so is plan-internal,
  * never surfaced — index_manager.rs bloom pruning). Words pack
  * [[BitsPerWord]] = 62 bits so every mask stays a positive BIGINT in
  * any engine (no signed `1 << 63` edge). Each shingle's md5 is
  * computed ONCE and the k positions derive from the hex — the probe
  * runs inside a higher-order-function lambda where Catalyst
  * subexpression elimination does not apply, so re-deriving the
  * digest per probe would cost 2k hashes per corpus shingle on the
  * exact hot path this operator exists to keep cheap.
  */
object BloomFilterDecontam {

  /** Usable bits per 64-bit word; capping at 62 keeps `1 << bit`
    * positive in every engine's checked BIGINT arithmetic. */
  val BitsPerWord = 62

  def numWords(mBits: Int): Int = (mBits + BitsPerWord - 1) / BitsPerWord

  /** The k probe positions derived from one already-computed md5 hex,
    * each in [0, mBits). Taking the HEX (not the item) keeps the
    * digest a single computation per item even inside HOF lambdas. */
  def positionsFromHex(hex: Column, mBits: Int, k: Int): Seq[Column] = {
    require(k >= 1, s"k must be >= 1: $k")
    require(mBits >= BitsPerWord, s"mBits must be >= $BitsPerWord: $mBits")
    val h1 = conv(substring(hex, 1, 8), 16, 10).cast("long")
    // odd stride (Kirsch–Mitzenmauer): never collapses the k probes
    val h2 = conv(substring(hex, 9, 8), 16, 10).cast("long")
      .bitwiseOR(lit(1L))
    (0 until k).map(i => (h1 + lit(i.toLong) * h2) % mBits)
  }

  /** Build the filter over a (bounded) item column: one small shuffle
    * keyed by word index, `bit_or` partial-aggregates map-side (and
    * absorbs duplicate items — setting a bit twice is a no-op, so
    * callers need not dedupe first), and the result collects to
    * `numWords(mBits)` longs — the filter is driver-resident by
    * design (KBs even at mBits in the millions). */
  def build(items: DataFrame, item: Column, mBits: Int, k: Int): Array[Long] = {
    val pos = items
      .select(md5(item).as("hex"))
      .select(explode(array(positionsFromHex(col("hex"), mBits, k): _*))
        .as("pos"))
    val packed = pos
      .select(expr(s"pos div $BitsPerWord").as("word"),
        call_function("shiftleft", lit(1L),
          (col("pos") % BitsPerWord).cast("int")).as("mask"))
      .groupBy("word").agg(call_function("bit_or", col("mask")).as("bits"))
      .collect()
    val arr = new Array[Long](numWords(mBits))
    packed.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Membership probe over an already-computed md5 hex as a pure
    * scan-stage expression: all k probed bits set in the literal word
    * array. */
  def mightContainHex(words: Array[Long], mBits: Int, k: Int)(
      hex: Column): Column = {
    require(words.length == numWords(mBits),
      s"filter has ${words.length} words, mBits=$mBits needs ${numWords(mBits)}")
    val wl = typedlit(words.toSeq)
    positionsFromHex(hex, mBits, k).map { p =>
      val word = element_at(wl, (p.cast("int") / BitsPerWord).cast("int") + 1)
      val bit = (p % BitsPerWord).cast("int")
      (call_function("shiftright", word, bit) % 2) === 1
    }.reduce(_ && _)
  }

  /** Membership probe for a raw item. When probing many items per row
    * (an array column), `transform` to md5 hexes first and use
    * [[mightContainHex]] so each digest is computed once. */
  def mightContain(words: Array[Long], mBits: Int, k: Int)(
      item: Column): Column =
    mightContainHex(words, mBits, k)(md5(item))

  /** Per-document contamination stats for `docs` against the filter
    * built from `refDocs`' distinct n-gram shingles: (doc_id,
    * n_shingles, n_hits, contaminated). Shingles follow
    * [[Dedup.shingleSet]] (distinct '_'-joined word n-grams; docs
    * shorter than n have none and report 0/0/false). */
  def decontam(docs: DataFrame, refDocs: DataFrame, n: Int,
      mBits: Int, k: Int): DataFrame = {
    // no distinct(): build()'s bit_or packing is idempotent to
    // duplicate shingles and its map-side partials absorb them — a
    // pre-dedup would just add a shuffle of the exploded set
    val refShingles = refDocs
      .select(explode(Dedup.shingleSet(col("text"), n)).as("s"))
    val bloom = build(refShingles, col("s"), mBits, k)
    val probe = mightContainHex(bloom, mBits, k) _
    docs
      .withColumn("_sh", Dedup.shingleSet(col("text"), n))
      .select(col("doc_id"),
        size(col("_sh")).cast("long").as("n_shingles"),
        // digest each (distinct) shingle once, probe the hex k times
        size(filter(transform(col("_sh"), s => md5(s)), h => probe(h)))
          .cast("long").as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }
}
