package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the engine-side exchange-sizing arithmetic and its raise-only
  * session behavior (SCALE.md third-decade finding moved into the
  * engine: undersized shuffles OOM at 1000× scale, oversized ones are
  * AQE-coalesced, so sizing derives from measured scan bytes). */
class ShuffleSizingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("partitionsFor keeps tasks under the 64 MB target, clamped to floor and ceiling") {
    val T = ShuffleSizing.TargetBytesPerTask
    // zero / tiny input: the session floor holds
    assert(ShuffleSizing.partitionsFor(BigInt(0), 32) === 32)
    assert(ShuffleSizing.partitionsFor(BigInt(1), 32) === 32)
    // the known stats fixture: a 1.5 B-row shingle exchange at ~100 B
    // per buffered row (~150 GB) — the sf100 OOM shape — derives
    // ~2400 partitions, never the fatal 32
    val shingle = BigInt(150L) << 30
    val got = ShuffleSizing.partitionsFor(shingle, 32)
    assert(got === ((shingle + T - 1) / T).toInt)
    assert(got > 2000 && got < 3000)
    // exact boundary arithmetic: one byte over a task adds a task
    assert(ShuffleSizing.partitionsFor(BigInt(T) * 100, 1) === 100)
    assert(ShuffleSizing.partitionsFor(BigInt(T) * 100 + 1, 1) === 101)
    // ceiling clamp
    assert(ShuffleSizing.partitionsFor(BigInt(1) << 60, 32)
      === ShuffleSizing.MaxPartitions)
  }

  test("ensureFor raises AQE initial partitions and never lowers them") {
    val key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    val before = spark.conf.getOption(key)
    try {
      spark.conf.unset(key)
      val sess = spark.sessionState.conf.numShufflePartitions
      // small exchange: session default stands, conf untouched
      assert(ShuffleSizing.ensureFor(spark, BigInt(1024)) === sess)
      assert(spark.conf.getOption(key).isEmpty)
      // large exchange: raised to the derived count
      val bytes = BigInt(ShuffleSizing.TargetBytesPerTask) * 500
      assert(ShuffleSizing.ensureFor(spark, bytes) === 500)
      assert(spark.conf.get(key) === "500")
      // a smaller later exchange never lowers it (raise-only)
      assert(ShuffleSizing.ensureFor(spark, BigInt(1024)) === 500)
      assert(spark.conf.get(key) === "500")
      // but a bigger one raises further
      assert(ShuffleSizing.ensureFor(spark, bytes * 2) === 1000)
    } finally {
      before match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("scanBytes reads leaf parquet sizes and ignores unknown-size pinned scans") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val f = new java.io.File("/root/testdata/sf0.001/documents.parquet")
    val onDisk =
      if (f.isDirectory)
        f.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length).sum
      else f.length
    val got = ShuffleSizing.scanBytes(docs)
    // leaf stats are the on-disk bytes (Catalyst may add a constant
    // per-file overhead estimate; same order, never zero)
    assert(got >= onDisk / 2 && got <= BigInt(onDisk) * 4)
    // a derived plan keeps its leaves' sizes
    val derived = docs.join(docs.select("doc_id"), "doc_id")
      .groupBy("lang").count()
    assert(ShuffleSizing.scanBytes(derived) >= got)
    // a pinned (localCheckpoint) scan has no file stats: contributes
    // zero instead of Catalyst's unknown-size sentinel
    val pinned = docs.localCheckpoint()
    assert(ShuffleSizing.scanBytes(pinned) < (BigInt(1) << 50))
  }
}
