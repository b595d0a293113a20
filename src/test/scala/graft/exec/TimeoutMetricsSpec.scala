package graft.exec

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Statement timeout (query_cancellation.rs:20-46, 200-233) and
  * SHOW METRICS (monitoring.rs:81-246): a statement exceeding the
  * session's timeout has its Spark jobs cancelled and raises a typed
  * error leaving no partial state; the engine keeps deterministic
  * counters.
  */
class TimeoutMetricsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("a statement exceeding STATEMENT_TIMEOUT is cancelled, cleanly") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY, v DOUBLE)")
    // a ~10^13-row cartesian aggregate: effectively never finishes
    e.attachExternal("li", "/root/testdata/sf0.01/lineitem.parquet")
    e.sql("SET STATEMENT_TIMEOUT 500")
    val t0 = System.nanoTime()
    intercept[QueryEngine.StatementTimeoutException] {
      e.sql("""INSERT INTO t
              |SELECT a.l_orderkey, SUM(a.l_quantity * b.l_quantity)
              |FROM li a CROSS JOIN li b
              |GROUP BY a.l_orderkey""".stripMargin)
    }
    val wallSec = (System.nanoTime() - t0) / 1e9
    assert(wallSec < 30.0, s"cancellation took too long: $wallSec s")
    // no partial state landed, and the session still works
    assert(e.sql("SELECT COUNT(*) AS n FROM t").collect() === Array(Row(0L)))
    e.sql("SET STATEMENT_TIMEOUT 0")
    e.sql("INSERT INTO t VALUES (1, 1.0)")
    assert(e.sql("SELECT COUNT(*) AS n FROM t").collect() === Array(Row(1L)))
  }

  test("timeout is per session; a fast statement under timeout succeeds") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY)")
    val slow = e.newSession()
    slow.sql("SET STATEMENT_TIMEOUT 60000")
    slow.sql("INSERT INTO t VALUES (1)") // well under the limit
    // the default session has no timeout configured
    e.sql("INSERT INTO t VALUES (2)")
    assert(e.sql("SELECT COUNT(*) AS n FROM t").collect() === Array(Row(2L)))
  }

  test("SHOW METRICS counts statements, failures, txns, snapshots") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY)")
    e.sql("INSERT INTO t VALUES (1), (2)")
    intercept[IllegalArgumentException] { e.sql("INSERT INTO t VALUES (1)") }
    e.sql("BEGIN"); e.sql("INSERT INTO t VALUES (3)"); e.sql("COMMIT")
    e.sql("BEGIN"); e.sql("DELETE FROM t"); e.sql("ROLLBACK")
    e.sql("SNAPSHOT t")
    val m = e.sql("SHOW METRICS").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("statements_failed") === 1L)
    assert(m("txn_commits") === 1L)
    assert(m("txn_rollbacks") === 1L)
    assert(m("snapshots_taken") === 1L)
    assert(m("tables") === 1L)
    assert(m("events_total") === 3L) // 2 inserts + 1 committed insert
    assert(m("statements_total") === 11L) // every statement incl. failed
  }

  test("SHOW OPTIMIZATIONS serves the engine's advice rows") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY)")
    val quiet = e.sql("SHOW OPTIMIZATIONS").collect()
    assert(quiet.map(_.getString(0)).toSeq === Seq("general"))
    // trip the slow log: a high-priority query_performance row appears
    e.sql("SET SLOW_LOG 1")
    e.sql("INSERT INTO t VALUES (1), (2)")
    val busy = e.sql("SHOW OPTIMIZATIONS").collect()
    assert(busy.exists(r => r.getString(0) == "query_performance" &&
      r.getString(1) == "high"), busy.mkString("; "))
    e.close()
  }

  test("SHOW PERF: bucket counts track statements; slow log honors SET SLOW_LOG") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY)")
    e.sql("INSERT INTO t VALUES (1), (2)")
    e.sql("SELECT COUNT(*) AS n FROM t").collect()
    def perf() = e.sql("SHOW PERF").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getString(3))).toSeq
    val p1 = perf()
    // every statement so far landed in exactly one bucket
    val bucketSum = p1.collect { case ("bucket", _, n, _) => n }.sum
    val statements = p1.collect {
      case ("summary", "statements", n, _) => n }.head
    assert(statements >= 3.0 && bucketSum === statements)
    assert(p1.collect { case ("summary", "max_ms", v, _) => v }.head > 0.0)
    // percentiles come from the sliding window and order correctly
    val p50 = p1.collect { case ("summary", "p50_ms", v, _) => v }.head
    val p99 = p1.collect { case ("summary", "p99_ms", v, _) => v }.head
    val mx = p1.collect { case ("summary", "max_ms", v, _) => v }.head
    assert(p50 > 0.0 && p50 <= p99 && p99 <= mx)
    // no threshold -> no slow entries
    assert(!p1.exists(_._1 == "slow"))
    // with a 0 ms... threshold must be > 0: use 1 ms — engine DML always
    // exceeds it (Spark job dispatch alone is >1 ms)
    e.sql("SET SLOW_LOG 1")
    e.sql("INSERT INTO t VALUES (3)")
    val p2 = perf()
    val slows = p2.filter(_._1 == "slow")
    assert(slows.nonEmpty, "slow log empty after a >1ms statement")
    assert(slows.exists(_._4.startsWith("INSERT INTO t VALUES (3)")))
    assert(p2.collect {
      case ("summary", "slow_threshold_ms", v, _) => v }.head === 1.0)
    // disabling clears the log
    e.sql("SET SLOW_LOG 0")
    assert(!perf().exists(_._1 == "slow"))
  }
}
