package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-mixture sampling — compose a training corpus to declared
  * per-domain proportions of a token budget (pipeline extension; the
  * reference has no sampling surface at all). Mixture weights are the
  * knob every large pretraining run turns: "600‰ web, 300‰ books,
  * 100‰ code of a 2T-token budget".
  *
  * Determinism discipline matches `Sampling`: the keep decision is an
  * integer comparison on a multiplicative key hash — reproducible
  * across runs AND engines (exactly expressible in ANSI SQL), so the
  * sampled corpus is auditable and resumable. A domain's acceptance
  * rate is `min(1, target/available)` applied as
  * `bucket(key) · available < min(available, target) · 1000` — all
  * BIGINT arithmetic, no floating-point rate to drift.
  *
  * 100 TB shape: one small per-domain aggregate (domains number in
  * the dozens), broadcast back onto the corpus, then a pure filter
  * evaluated inside the scan stage. The corpus never shuffles. */
object Mixture {

  /** `(key * knuth) % 1000` — the per-mille sampling bucket. Exact
    * (and ANSI-SQL re-derivable, hence the oracle-checked default) for
    * keys < 3.4e9; wider id domains use [[permilleBucket64]]. */
  def permilleBucket(key: Column): Column =
    pmod(key.cast("long") * lit(2654435761L), lit(1000L))

  /** 64-bit per-mille bucket for id domains past the closed-form
    * bound: xxhash64 never overflows, so the bucket stays uniform at
    * any BIGINT id. Not re-derivable in ANSI SQL — verified by
    * distribution properties (CurationSpec), not the oracle. */
  def permilleBucket64(key: Column): Column =
    pmod(xxhash64(key.cast("long")), lit(1000L))

  /** Sample `docs` to the mixture: keep a row iff its key bucket
    * falls under its domain's acceptance rate. Returns the kept rows
    * unchanged. `wide = true` forces the 64-bit bucket; with
    * `wide = false` the key domain is probed (KeyDomain.needsWide) and
    * ids past the closed-form bound auto-switch rather than silently
    * wrapping. */
  def sample(docs: DataFrame, domainCol: String, key: Column,
      nTokens: Column, weights: Map[String, Int], defaultPermille: Int,
      budget: Long, wide: Boolean = false): DataFrame = {
    val useWide = wide || KeyDomain.needsWide(docs, key, "Mixture.sample")
    // targets resolve to Long LITERALS (exact integer floor) — Spark's
    // column `/` is floating-point division and a drifted rate would
    // desync the sample from any SQL re-derivation of it
    val tgt = weights.foldLeft(lit(budget * defaultPermille / 1000L)) {
      case (acc, (d, p)) =>
        when(col(domainCol) === lit(d), lit(budget * p / 1000L)).otherwise(acc)
    }
    val stats = docs.groupBy(col(domainCol))
      .agg(sum(nTokens).cast("long").as("_avail"))
      .withColumn("_tgt", tgt)
    val bucket = if (useWide) permilleBucket64(key) else permilleBucket(key)
    docs.join(broadcast(stats), domainCol)
      .where(bucket * col("_avail") <
        least(col("_avail"), col("_tgt")) * lit(1000L))
      .drop("_avail", "_tgt")
  }

  /** Weighted UPSAMPLING — the other half of mixture composition:
    * domains weighted ABOVE their availability repeat ("Wikipedia for
    * 3.4 epochs"). Each row emits `floor(w)` copies plus one more iff
    * its per-mille key bucket falls under `frac(w)·1000` — so a weight
    * of 3.4 yields exactly 3 copies for ~60% of rows and 4 for ~40%,
    * deterministic per key and exactly re-derivable in ANSI SQL (the
    * oracle's arithmetic is identical). Weights arrive per-mille
    * (`wPermille` = weight·1000 as a column, e.g. 3400) to keep the
    * whole decision in BIGINT — no floating-point rate to drift.
    *
    * Output: the input rows with an `epoch` column (1..copies); rows
    * with weight 0 (or a negative/null weight) vanish. 100 TB shape:
    * `explode(sequence(...))` is pure scan-stage row generation — the
    * corpus never shuffles, and output volume is exactly the token
    * budget the weights describe. */
  def upsample(docs: DataFrame, key: Column, wPermille: Column,
      wide: Boolean = false): DataFrame = {
    val useWide = wide || KeyDomain.needsWide(docs, key, "Mixture.upsample")
    val bucket = if (useWide) permilleBucket64(key) else permilleBucket(key)
    val w = wPermille.cast("long")
    // integer floor division written exactly: the numerator is a
    // multiple of 1000, so the double division is error-free for any
    // realistic per-mille weight (< 2^52)
    val whole = ((w - pmod(w, lit(1000L))) / lit(1000L)).cast("long")
    val copies = whole +
      when(bucket < pmod(w, lit(1000L)), 1L).otherwise(0L)
    docs.withColumn("epoch",
        explode(when(copies > 0, sequence(lit(1L), copies))
          .otherwise(array().cast("array<long>"))))
  }

  /** Temperature-scaled mixture weights — the multilingual/multi-domain
    * alpha-sampling rule (w_d ∝ n_d^alpha, alpha in (0,1] flattens the
    * size distribution so small domains are not drowned; the standard
    * knob of multilingual pretraining). Returns one row per domain:
    * (domainCol, n_tokens, w_e6) with w_e6 = the normalized weight
    * scaled by 1e6 (the w_e6 column sums to ~1e6).
    *
    * Determinism: each domain's n^alpha snaps to the e6 integer grid
    * via `floor(x*1e6 + 0.5)` — multiply, add and floor are exact IEEE
    * ops and alpha = 0.5 uses `sqrt`, which IEEE 754 requires to be
    * correctly rounded, so `pw_e6` is bit-identical in any engine
    * (`ROUND(double, n)` is NOT: decimal rounding of a binary double
    * lands on different last-ulp results across engines/versions,
    * which breaks hash-checked output — and hashed columns must also
    * be genuinely integer-typed, since an oracle HUGEINT surfaces as
    * pandas float64 and hash-flips even when values agree). Z then
    * sums the exact integers (addition-order-free) and the normalized
    * weight surfaces as `w_e6 = half_up(1e6*pw/Z)` computed as
    * `(2*pw_e6*1e6 + z_e6) div (2*z_e6)` — pure integer arithmetic
    * end to end. Overflow-safe below ~2e13 tokens per domain
    * (pw_e6·2e6 < 2^63). The weight table is |domains| rows at any
    * corpus size; the only corpus-scale work is the per-domain token
    * aggregate. */
  def temperatureWeights(docs: DataFrame, domainCol: String,
      nTokens: Column, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1]: $alpha")
    def p(x: Column): Column =
      if (alpha == 0.5) sqrt(x) else pow(x, lit(alpha))
    val scaled = docs.groupBy(col(domainCol))
      .agg(sum(nTokens).cast("long").as("n_tokens"))
      .withColumn("_pwe6",
        floor(p(col("n_tokens").cast("double")) * 1000000 + 0.5).cast("long"))
    val z = scaled.agg(sum(col("_pwe6")).cast("long").as("_ze6"))
    scaled.crossJoin(broadcast(z))
      .withColumn("w_e6", expr("(2 * _pwe6 * 1000000L + _ze6) div (2 * _ze6)"))
      .select(col(domainCol), col("n_tokens"), col("w_e6"))
  }

  /** Compose temperatureWeights with [[sample]]: resolve the alpha-
    * scaled weights to per-mille integers (half-up on the exact
    * scaled-integer weight — pure integer arithmetic, no double
    * drift) and sample the corpus to them. The weight table is
    * collected — it is |domains| rows by construction. */
  def temperatureSample(docs: DataFrame, domainCol: String, key: Column,
      nTokens: Column, alpha: Double, budget: Long,
      wide: Boolean = false): DataFrame = {
    val weights = temperatureWeights(docs, domainCol, nTokens, alpha)
      .collect()
      .map(r => r.getString(0) ->
        ((2 * r.getLong(2) + 1000) / 2000).toInt)
      .toMap
    sample(docs, domainCol, key, nTokens, weights, defaultPermille = 0,
      budget, wide)
  }
}
