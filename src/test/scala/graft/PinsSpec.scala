package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the deterministic pin-release helpers (Pins.scala):
  * the bench/verify harnesses and every iterative operator depend on
  * these semantics — a silent no-op here re-opens the block-manager
  * leak that inflated heavy suite queries 4-18x. Assertions track the
  * SPECIFIC checkpoint RDD ids (never global persistent-RDD counts),
  * so concurrently running suites can pin freely without interference
  * either way. */
class PinsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def leafIds(df: DataFrame): Seq[Int] =
    df.queryExecution.logical.collectLeaves().collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id
    }

  private def persisted(id: Int): Boolean =
    spark.sparkContext.getPersistentRDDs.contains(id)

  private def awaitGone(ids: Seq[Int]): Unit = {
    val deadline = System.nanoTime() + 10e9.toLong
    while (ids.exists(persisted) && System.nanoTime() < deadline)
      Thread.sleep(50) // unpersist(blocking = false) is async
    assert(!ids.exists(persisted), s"still persisted: ${ids.filter(persisted)}")
  }

  test("free releases a localCheckpoint pin; idempotent; no-op on plain frames") {
    import spark.implicits._
    val pinned = Seq(1, 2, 3).toDF("x").localCheckpoint()
    val ids = leafIds(pinned)
    assert(ids.nonEmpty && ids.forall(persisted))
    Pins.free(pinned)
    awaitGone(ids)
    Pins.free(pinned) // second free: harmless
    Pins.free(Seq(1).toDF("x")) // non-pinned plan: no-op, no error
  }

  test("free on a derived plan releases the checkpoint behind it") {
    import spark.implicits._
    val pinned = Seq(1, 2, 3).toDF("x").localCheckpoint()
    val derived = pinned.select(org.apache.spark.sql.functions.col("x") * 2)
    val ids = leafIds(derived)
    assert(ids.nonEmpty && ids.forall(persisted))
    Pins.free(derived) // the plan leaf IS the checkpoint RDD
    awaitGone(ids)
  }

  // NOTE: Pins.sweep is deliberately NOT unit-tested here — it
  // unpersists EVERY persistent RDD in the session, and sbt runs
  // suites in parallel against the shared TestSpark session, so a
  // mid-run sweep would strand other suites' live pins (an
  // unpersisted localCheckpoint cannot be recomputed). The sweep path
  // is exercised where it is safe by design: between the independent
  // queries of the Bench and Verify mains.
}
