package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-9 curation operators: repetition quality
  * gate, seeded training order, BPE pair stats, int8 quantization. */
class CurationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private def emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  // -------------------------------------------------- QualityFilters

  test("repetition fractions live in (0, 1] and gate composes them") {
    val g = QualityFilters.repetitionGate(docs, 0.2, 0.6)
    assert(g.where(col("top_2gram_frac") <= 0 || col("top_2gram_frac") > 1 ||
      col("dup_3gram_frac") < 0 || col("dup_3gram_frac") > 1).count() === 0)
    assert(g.where(col("passes") =!=
      (col("top_2gram_frac") <= 0.2 && col("dup_3gram_frac") <= 0.6))
      .count() === 0)
  }

  test("a degenerate repeated document fails the gate, a diverse one passes") {
    val d = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val g = QualityFilters.repetitionGate(d, 0.2, 0.6).orderBy("doc_id")
      .select("doc_id", "passes").as[(Long, Boolean)].collect()
    assert(g === Array((1L, false), (2L, true)))
  }

  test("ngrams of a doc shorter than n is empty, not an error") {
    val d = Seq((1L, "solo")).toDF("doc_id", "text")
    val out = d.select(size(QualityFilters.ngrams(col("text"), 2)).as("n"))
      .head().getInt(0)
    assert(out === 0)
  }

  test("per-row repetition metrics equal the explode/groupBy form on the fixture") {
    // the shuffle-heavy form the native expression replaced, kept here
    // as the independent oracle
    def explodedMetrics(n: Int) = {
      val grams = docs.select(col("doc_id"),
        explode(QualityFilters.ngrams(col("text"), n)).as("gram"))
      grams.groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n_grams"), max("c").as("_top"),
          coalesce(sum(when(col("c") > 1, col("c"))), lit(0L)).as("_dup"))
        .select(col("doc_id"), col("n_grams"),
          (col("_top").cast("double") / col("n_grams")).as("top_gram_frac"),
          (col("_dup").cast("double") / col("n_grams")).as("dup_gram_frac"))
    }
    for (n <- Seq(2, 3)) {
      val native = QualityFilters.repetitionMetrics(docs, n)
      assert(native.exceptAll(explodedMetrics(n)).count() === 0, s"n=$n extra")
      assert(explodedMetrics(n).exceptAll(native).count() === 0, s"n=$n missing")
    }
  }

  test("the repetition gate plan has no exchange: pure scan-stage work") {
    val plan = QualityFilters.repetitionGate(docs, 0.2, 0.6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"gate shuffles:\n$plan")
    assert(!plan.contains("Join"), s"gate joins:\n$plan")
  }

  // -------------------------------------------------- TrainingOrder

  test("training order is a seeded permutation: same seed identical, different seed different") {
    val a = TrainingOrder.shardPlan(docs, col("doc_id"), 7L, 4)
      .select("doc_id", "shard", "pos").orderBy("doc_id").collect()
    val b = TrainingOrder.shardPlan(docs, col("doc_id"), 7L, 4)
      .select("doc_id", "shard", "pos").orderBy("doc_id").collect()
    val c = TrainingOrder.shardPlan(docs, col("doc_id"), 8L, 4)
      .select("doc_id", "shard", "pos").orderBy("doc_id").collect()
    assert(a.sameElements(b))
    assert(!a.sameElements(c))
  }

  test("64-bit keys: permutation quality holds at ids past the 32-bit bound") {
    // ids around 5e9 — past the closed-form key's exact range
    val n = 4000
    val base = 5000000000L
    val wide = spark.range(n).select((col("id") * 1000L + base).as("doc_id"))

    // deterministic per (key, seed): two runs agree, seeds differ
    val p1 = TrainingOrder.shardPlan(wide, col("doc_id"), 7L, 16, wide = true)
      .select("doc_id", "shard", "pos").orderBy("doc_id").collect()
    val p2 = TrainingOrder.shardPlan(wide, col("doc_id"), 7L, 16, wide = true)
      .select("doc_id", "shard", "pos").orderBy("doc_id").collect()
    val p3 = TrainingOrder.shardPlan(wide, col("doc_id"), 8L, 16, wide = true)
      .select("doc_id", "shard", "pos").orderBy("doc_id").collect()
    assert(p1.sameElements(p2))
    assert(!p1.sameElements(p3))

    // shard balance: 16 shards over 4000 rows — every shard within
    // 2x of the mean (a collapsed hash would pile into few shards)
    val sizes = p1.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    assert(sizes.keySet === (0L until 16L).toSet, sizes.keySet)
    assert(sizes.values.max < 2 * n / 16, sizes)
    assert(sizes.values.min > n / 16 / 2, sizes)

    // the permutation scatters: consecutive ids almost never stay
    // consecutive in (shard, pos) order
    val rank = p1.sortBy(r => (r.getLong(1), r.getInt(2)))
      .zipWithIndex.map { case (r, i) => r.getLong(0) -> i }.toMap
    val adjacentKept = (0 until n - 1).count { i =>
      rank(base + i * 1000L) + 1 == rank(base + (i + 1) * 1000L)
    }
    assert(adjacentKept < n / 100, s"$adjacentKept of $n adjacent pairs survived")

    // 64-bit order keys collide no more than statistics allows
    // (4000 draws from 2^64 — any collision would be a hash bug)
    val distinctKeys = wide
      .select(TrainingOrder.orderKey64(col("doc_id"), 7L).as("k"))
      .distinct().count()
    assert(distinctKeys === n.toLong)

    // mixture bucket uniformity at wide ids: 4000 draws over 1000
    // buckets is mean 4 — a Poisson tail reaches ~14; bound at
    // mean + 6·sqrt(mean) (a collapsed hash piles hundreds into one)
    val buckets = wide.select(Mixture.permilleBucket64(col("doc_id")).as("b"))
      .groupBy("b").count().select("count").as[Long].collect()
    val mean = n / 1000.0
    assert(buckets.max <= mean + 6 * math.sqrt(mean), s"max bucket ${buckets.max}")

    // and the wide mixture sample still lands near its target rate
    val dom = wide.withColumn("domain", lit("web"))
      .withColumn("n_tokens", lit(100L))
    val kept = Mixture.sample(dom, "domain", col("doc_id"), col("n_tokens"),
      Map("web" -> 500), 0, n * 100L, wide = true).count()
    assert(math.abs(kept - n / 2) < n / 10, s"kept $kept of $n at 500 permille")
  }

  test("ids past the closed-form bound auto-switch to the 64-bit key") {
    val n = 1000
    val base = 5000000000L // past KeyDomain.ClosedFormMaxKey
    val wide = spark.range(n).select((col("id") * 1000L + base).as("doc_id"))
    // shardPlan WITHOUT wide=true equals the forced 64-bit plan —
    // the probe detected the domain and switched automatically
    val auto = TrainingOrder.shardPlan(wide, col("doc_id"), 7L, 8)
      .select("doc_id", "shard", "pos").orderBy("doc_id").collect()
    val forced = TrainingOrder.shardPlan(wide, col("doc_id"), 7L, 8, wide = true)
      .select("doc_id", "shard", "pos").orderBy("doc_id").collect()
    assert(auto.sameElements(forced))
    // same for the mixture bucket paths
    val dom = wide.withColumn("domain", lit("web"))
      .withColumn("n_tokens", lit(100L))
    val autoKept = Mixture.sample(dom, "domain", col("doc_id"),
      col("n_tokens"), Map("web" -> 500), 0, n * 100L)
      .select("doc_id").orderBy("doc_id").collect()
    val forcedKept = Mixture.sample(dom, "domain", col("doc_id"),
      col("n_tokens"), Map("web" -> 500), 0, n * 100L, wide = true)
      .select("doc_id").orderBy("doc_id").collect()
    assert(autoKept.sameElements(forcedKept))
    val autoUp = Mixture.upsample(wide, col("doc_id"), lit(1400L))
      .orderBy("doc_id", "epoch").collect()
    val forcedUp = Mixture.upsample(wide, col("doc_id"), lit(1400L),
      wide = true).orderBy("doc_id", "epoch").collect()
    assert(autoUp.sameElements(forcedUp))
    // small-id corpora keep the closed form (SQL-re-derivable): the
    // auto plan equals the explicit closed-form key order
    val small = spark.range(n).select(col("id").as("doc_id"))
    val autoSmall = TrainingOrder.shardPlan(small, col("doc_id"), 7L, 8)
    // closed form still in the plan: xxhash64 absent for small ids
    assert(!autoSmall.queryExecution.analyzed.toString.contains("xxhash64"))
    assert(autoSmall.count() === n)
    // negative ids beyond the bound also switch (overflow is symmetric)
    val neg = spark.range(n).select((lit(-base) - col("id")).as("doc_id"))
    val autoNeg = TrainingOrder.shardPlan(neg, col("doc_id"), 7L, 8)
      .select("doc_id", "shard", "pos").orderBy("doc_id").collect()
    val forcedNeg = TrainingOrder.shardPlan(neg, col("doc_id"), 7L, 8,
      wide = true).select("doc_id", "shard", "pos").orderBy("doc_id").collect()
    assert(autoNeg.sameElements(forcedNeg))
  }

  test("per-shard positions are contiguous 1..n and shards cover [0, numShards)") {
    val p = TrainingOrder.shardPlan(docs, col("doc_id"), 42L, 4)
    val perShard = p.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
        countDistinct("pos").as("d"))
    assert(perShard.where(col("lo") =!= 1 || col("hi") =!= col("n") ||
      col("d") =!= col("n")).count() === 0)
    assert(p.select("shard").distinct().as[Long].collect().sorted
      === Array(0L, 1L, 2L, 3L))
  }

  // -------------------------------------------------- TextAnalysis.bpePairStats

  test("bpe pair stats count adjacent pairs exactly") {
    val d = Seq((1L, "a b a b c"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.bpePairStats(d, 10)
      .select("pair", "n").as[(String, Long)].collect().toMap
    // "a b": doc1 twice + doc2 once; "b a"/"b c": doc1 once each
    assert(got === Map("a b" -> 3L, "b a" -> 1L, "b c" -> 1L))
  }

  // -------------------------------------------------- Quantize

  test("int8 codes are clamped and reconstruction error is within scale/2") {
    val q = Quantize.int8(emb, "embedding")
    assert(q.where(exists(col("codes"),
      c => c > 127 || c < -127)).count() === 0)
    // floor(x/s + 0.5)*s is within s/2 of x up to one ulp of slack
    assert(q.where(col("max_abs_err") > col("scale") / 2 * 1.0000001)
      .count() === 0)
  }

  test("zero vectors quantize to zero codes with zero scale") {
    val d = Seq((1L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Quantize.int8(d, "embedding")
      .select(col("scale"), col("max_abs_err"),
        size(filter(col("codes"), c => c =!= 0)).as("nz"))
      .head()
    assert(r.getDouble(0) === 0.0 && r.getDouble(1) === 0.0 && r.getInt(2) === 0)
  }

  test("quantization preserves cosine neighborhoods approximately") {
    // dequantized top-1 neighbor of each query matches the exact top-1
    // for most queries — the property that makes int8 usable for ANN
    val deq = Quantize.int8(emb, "embedding")
      .select(col("vec_id"),
        transform(col("codes"), c => c * col("scale")).as("embedding"))
    def top1(df: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(df.where(col("vec_id") < 20), df, 1)
        .select("qid", "cid").as[(Long, Long)].collect().toMap
    val exact = top1(emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("embedding")))
    val quant = top1(deq)
    val agree = exact.count { case (q, c) => quant.get(q).contains(c) }
    assert(agree >= 18, s"only $agree/20 top-1 neighbors preserved")
  }
}
