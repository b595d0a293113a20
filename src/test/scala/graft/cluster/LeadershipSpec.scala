package graft.cluster

import graft.TestSpark
import graft.exec.QueryEngine
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Leader election + epoch fencing (the reference's raft.rs term
  * machinery, re-expressed as a storage lease): single-winner
  * elections under contention, lease expiry and renewal on an
  * injected clock, and — the part that makes failover safe — a
  * deposed leader's in-flight write aborting at the engine's commit
  * point with nothing durable. */
class LeadershipSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def coordDir(): String =
    java.nio.file.Files.createTempDirectory("graft-coord").toString

  test("exactly one contender wins an epoch under a thread race") {
    val dir = coordDir()
    @volatile var now = 0L
    val nodes = (1 to 8).map(i =>
      new Leadership(spark, dir, s"node-$i", leaseMs = 1000, clock = () => now))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val gate = new java.util.concurrent.CountDownLatch(1)
      val wins = nodes.map { n =>
        pool.submit(new java.util.concurrent.Callable[Option[String]] {
          def call(): Option[String] = { gate.await(); n.tryAcquire().map(_ => n.nodeId) }
        })
      }
      gate.countDown()
      val winners = wins.flatMap(_.get())
      assert(winners.size === 1, s"multiple epoch winners: $winners")
      assert(nodes.head.currentEpoch() === 1)
      assert(nodes.head.leaderOf(1) === Some(winners.head))
      // the live lease blocks every further claim
      assert(nodes.forall(_.tryAcquire().isEmpty))
    } finally pool.shutdownNow()
  }

  test("renewal holds the lease; expiry opens the next epoch; release is immediate") {
    val dir = coordDir()
    @volatile var now = 0L
    val a = new Leadership(spark, dir, "a", leaseMs = 1000, clock = () => now)
    val b = new Leadership(spark, dir, "b", leaseMs = 1000, clock = () => now)
    val lease = a.tryAcquire().getOrElse(fail("a should win epoch 1"))
    now = 900; lease.renew()
    now = 1800 // 900ms since renewal: still inside the lease
    assert(b.tryAcquire().isEmpty)
    now = 1900 // 1000ms since renewal: lapsed
    val l2 = b.tryAcquire().getOrElse(fail("b should claim epoch 2"))
    assert(l2.epoch === 2 && b.currentEpoch() === 2)
    assert(!lease.stillLeader() && l2.stillLeader())
    // voluntary release hands over without waiting out the lease
    l2.release()
    val l3 = a.tryAcquire().getOrElse(fail("a should claim epoch 3 after release"))
    assert(l3.epoch === 3)
  }

  test("a deposed leader's write aborts at the commit point, nothing lands") {
    val dir = coordDir()
    @volatile var now = 0L
    val nodeA = new Leadership(spark, dir, "a", leaseMs = 1000, clock = () => now)
    val nodeB = new Leadership(spark, dir, "b", leaseMs = 1000, clock = () => now)
    val e = QueryEngine.scratch(spark)
    try {
      val leaseA = nodeA.tryAcquire().getOrElse(fail("a wins epoch 1"))
      leaseA.attach(e)
      e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY, v BIGINT)")
      e.sql("INSERT INTO t VALUES (1, 10), (2, 20)")
      val seqBefore = e.catalog.lastSeq("t")
      // a stalls (GC pause): no renewals; b takes over
      now = 1500
      assert(nodeB.tryAcquire().isDefined, "b should claim epoch 2")
      // a wakes up mid-statement: the fence fires BEFORE the manifest
      // rename — pre-commit, so the statement fails whole
      val ex = intercept[Exception](e.sql("INSERT INTO t VALUES (3, 30)"))
      assert(ex.getMessage.contains("fenced"), ex.getMessage)
      assert(e.catalog.lastSeq("t") === seqBefore, "fenced write advanced the log")
      assert(e.sql("SELECT COUNT(*) AS n FROM t").collect().head.getLong(0) === 2)
      // ...and a transaction COMMIT is fenced the same way
      leaseA.attach(e) // still the stale epoch-1 lease
      e.sql("BEGIN")
      e.sql("INSERT INTO t VALUES (4, 40)")
      val ex2 = intercept[Exception](e.sql("COMMIT"))
      assert(ex2.getMessage.contains("fenced"), ex2.getMessage)
      // the failed COMMIT leaves the txn open (its buffer would still
      // be visible to read-your-writes) — roll back, then prove
      // nothing became durable
      e.sql("ROLLBACK")
      assert(e.catalog.lastSeq("t") === seqBefore)
      assert(e.sql("SELECT COUNT(*) AS n FROM t").collect().head.getLong(0) === 2)
    } finally e.close()
  }

  test("failover end-to-end: replicate, depose, promote, fence the old primary") {
    val dir = coordDir()
    @volatile var now = 0L
    val nodeP = new Leadership(spark, dir, "primary", leaseMs = 1000, clock = () => now)
    val nodeR = new Leadership(spark, dir, "replica", leaseMs = 1000, clock = () => now)
    val primary = QueryEngine.scratch(spark)
    val replica = QueryEngine.scratch(spark)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-repl-ck").toString
    try {
      val leaseP = nodeP.tryAcquire().getOrElse(fail("primary wins epoch 1"))
      leaseP.attach(primary)
      primary.sql("CREATE TABLE t (k BIGINT PRIMARY KEY, v BIGINT)")
      primary.sql("INSERT INTO t SELECT id, id * 2 FROM range(50)")
      replica.sql("CREATE TABLE t (k BIGINT PRIMARY KEY, v BIGINT)")
      val q = graft.streaming.Replication.follow(primary, replica, "t",
        s"$ckpt/t", Trigger.AvailableNow())
      q.awaitTermination()
      assert(replica.sql("SELECT COUNT(*) AS n FROM t").collect().head.getLong(0) === 50)
      // primary dies; the replica claims the next epoch and serves writes
      now = 1500
      val leaseR = nodeR.tryAcquire().getOrElse(fail("replica claims epoch 2"))
      leaseR.attach(replica)
      replica.sql("INSERT INTO t VALUES (100, 200)")
      assert(replica.sql("SELECT COUNT(*) AS n FROM t").collect().head.getLong(0) === 51)
      // the zombie primary cannot split-brain: its next write is fenced
      val ex = intercept[Exception](primary.sql("INSERT INTO t VALUES (999, 0)"))
      assert(ex.getMessage.contains("fenced"), ex.getMessage)
      // the promoted replica's sequences continued past the replicated
      // high-water mark — temporal queries stay coherent across failover
      assert(replica.catalog.lastSeq("t") === 51)
      assert(replica.sql("SELECT COUNT(*) AS n FROM t FOR SYSTEM_TIME AS OF @SEQ:50")
        .collect().head.getLong(0) === 50)
    } finally { primary.close(); replica.close() }
  }
}
