package graft.exec

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Security monitoring / intrusion detection (security_monitor.rs):
  * injection signature scan, brute-force window + auto-block, data
  * exfiltration flag, per-session risk scoring, and the superuser
  * gates on the SHOW/SET surfaces. All clocks injected.
  */
class SecuritySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("SQL injection signatures raise a CRITICAL threat") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY, v STRING)")
    e.sql("INSERT INTO t VALUES (1, 'a')")
    e.sql("SELECT * FROM t WHERE k = 1 OR 1=1")
    val threats = e.sql("SHOW SECURITY THREATS").collect()
    assert(threats.length === 1)
    assert(threats.head.getString(1) === "SQLInjection")
    assert(threats.head.getString(2) === "CRITICAL")
    assert(threats.head.getString(5) === "or 1=1")
    val stats = e.sql("SHOW SECURITY STATS").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats("suspicious_queries") === 1L)
    assert(stats("threats_detected") === 1L)
  }

  test("brute force: threshold inside the window fires once; auto-block refuses the source") {
    val e = QueryEngine.scratch(spark)
    var now = 1000000L
    e.security.clockMs = () => now
    e.sql("SET SECURITY_AUTOBLOCK ON")
    for (_ <- 1 to 4) e.security.recordFailedLogin("10.0.0.9", "mallory")
    assert(!e.security.isBlocked("10.0.0.9"))
    e.security.recordFailedLogin("10.0.0.9", "mallory") // 5th in window
    assert(e.security.isBlocked("10.0.0.9"))
    // exactly ONE threat for the attack, not one per attempt past 5
    e.security.recordFailedLogin("10.0.0.9", "mallory")
    val threats = e.sql("SHOW SECURITY THREATS").collect()
      .filter(_.getString(1) == "BruteForceAttack")
    assert(threats.length === 1)
    assert(threats.head.getString(3) === "10.0.0.9")
    // outside the window the counter starts over
    now += 301000L
    e.security.recordFailedLogin("10.0.0.42", "eve")
    assert(!e.security.isBlocked("10.0.0.42"))
    val stats = e.sql("SHOW SECURITY STATS").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats("failed_login_attempts") === 7L)
    assert(stats("blocked_sources") === 1L)
    assert(stats("threats_mitigated") === 1L)
  }

  test("exfiltration flag on affected rows over the threshold") {
    val e = QueryEngine.scratch(spark)
    e.security.exfilRowThreshold = 10L
    e.sql("CREATE TABLE big (k BIGINT PRIMARY KEY)")
    e.sql("INSERT INTO big SELECT id FROM range(50)")
    val t = e.sql("SHOW SECURITY THREATS").collect()
    assert(t.length === 1)
    assert(t.head.getString(1) === "DataExfiltration")
    assert(t.head.getString(5) === "50 rows")
  }

  test("session tracking: statements, failures, rows, tables, risk formula") {
    val e = QueryEngine.scratch(spark)
    var now = 5000L
    e.security.clockMs = () => now
    e.sql("CREATE TABLE a (k BIGINT PRIMARY KEY)") // 1
    e.sql("INSERT INTO a VALUES (1), (2), (3)") // 2: rows 3
    intercept[IllegalArgumentException] {
      e.sql("INSERT INTO a VALUES (1)") // 3: failed (dup pk)
    }
    val s = e.sql("SHOW SESSIONS").collect() // 4 (sees 3 statements)
    assert(s.length === 1)
    val r = s.head
    assert(r.getString(1) === "root")
    assert(r.getLong(2) === 3L) // statements
    assert(r.getLong(3) === 1L) // failed
    assert(r.getLong(4) === 3L) // rows_accessed
    assert(r.getLong(5) === 1L) // tables: a
    assert(r.getDouble(6) === 1.0 / 3 * 0.3)
    // a second session tracks separately
    val s2 = e.newSession(); s2.setAuth("bob", superuser = true)
    s2.sql("SELECT count(*) AS n FROM a")
    val rows = e.sql("SHOW SESSIONS").collect()
    assert(rows.length === 2)
    assert(rows.map(_.getString(1)).toSet === Set("root", "bob"))
  }

  test("suspicious session: combined risk over 0.7 raises one threat") {
    val e = QueryEngine.scratch(spark)
    var now = 0L
    e.security.clockMs = () => now
    e.security.largeSessionRows = 5L
    e.security.longSessionMs = 1000L
    e.sql("CREATE TABLE t2 (k BIGINT PRIMARY KEY)")
    e.sql("INSERT INTO t2 SELECT id FROM range(10)") // rows 10 > 5 -> +0.4
    now += 2000L // duration > 1s -> +0.1
    for (_ <- 1 to 6) intercept[IllegalArgumentException] {
      e.sql("INSERT INTO t2 VALUES (1)") // pushes failure rate -> +0.3*x
    }
    // 8 statements, 6 failed: 0.75*0.3 + 0.4 + 0.1 = 0.725 > 0.7
    val sus = e.sql("SHOW SECURITY THREATS").collect()
      .filter(_.getString(1) == "SuspiciousSession")
    assert(sus.length === 1)
    // alert fires once, not on every later statement
    intercept[IllegalArgumentException](e.sql("INSERT INTO t2 VALUES (1)"))
    assert(e.sql("SHOW SECURITY THREATS").collect()
      .count(_.getString(1) == "SuspiciousSession") === 1)
  }

  test("SET SECURITY_MONITOR OFF stops recording; surfaces are gated") {
    val e = QueryEngine.scratch(spark)
    e.sql("SET SECURITY_MONITOR OFF")
    e.sql("CREATE TABLE q (k BIGINT PRIMARY KEY)")
    e.sql("SELECT * FROM q WHERE k = 1 OR 1=1")
    assert(e.sql("SHOW SECURITY THREATS").collect().isEmpty)
    assert(e.sql("SHOW SESSIONS").collect().isEmpty)
    e.sql("SET SECURITY_MONITOR ON")
    // non-superusers can neither read security state nor silence it
    val intern = e.newSession(); intern.setAuth("intern")
    intercept[SecurityException](intern.sql("SET SECURITY_MONITOR OFF"))
    intercept[SecurityException](intern.sql("SET SECURITY_AUTOBLOCK ON"))
    e.sql("SET PRIVILEGES ON")
    intercept[SecurityException](intern.sql("SHOW SECURITY THREATS"))
    intercept[SecurityException](intern.sql("SHOW SECURITY STATS"))
    intercept[SecurityException](intern.sql("SHOW SESSIONS"))
  }
}
