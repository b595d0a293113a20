package graft.exec

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** SET RATE_LIMIT: per-session token bucket for non-superusers,
  * driven by an injected clock so refill behavior is deterministic.
  */
class RateLimitSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("bucket empties at the burst, refills with time, exempts superusers") {
    val e = QueryEngine.scratch(spark)
    var nowNs = 0L
    e.rateClockNs = () => nowNs
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY)")
    e.sql("SET RATE_LIMIT 2 BURST 3")

    val alice = e.newSession(); alice.setAuth("alice")
    // burst of 3 passes, the 4th rejects
    alice.sql("SELECT COUNT(*) AS n FROM t")
    alice.sql("SELECT COUNT(*) AS n FROM t")
    alice.sql("SELECT COUNT(*) AS n FROM t")
    val err = intercept[IllegalStateException] { alice.sql("SELECT 1 AS x") }
    assert(err.getMessage.contains("rate limit exceeded"))

    // half a second at 2 qps = 1 token
    nowNs += 500L * 1000 * 1000
    alice.sql("SELECT 1 AS x")
    intercept[IllegalStateException] { alice.sql("SELECT 1 AS x") }

    // superuser session is exempt; rejection count is visible in PERF
    for (_ <- 1 to 5) e.sql("SELECT 1 AS x")
    val limited = e.sql("SHOW PERF")
      .where("item = 'rate_limited'").collect().head.getDouble(2)
    assert(limited === 2.0)

    // each session holds its own bucket
    val bob = e.newSession(); bob.setAuth("bob")
    bob.sql("SELECT 1 AS x") // fresh burst

    // a statement whose trigger body runs nested statements spends ONE token
    e.sql("CREATE TABLE audit_t (k BIGINT PRIMARY KEY)")
    e.sql("GRANT ALL ON t TO carol"); e.sql("GRANT ALL ON audit_t TO carol")
    e.sql("""CREATE TRIGGER tr AFTER INSERT ON t
            |EXECUTE INSERT INTO audit_t SELECT k FROM new_rows""".stripMargin
      .replace("\n", " "))
    val carol = e.newSession(); carol.setAuth("carol")
    nowNs += 10L * 1000 * 1000 * 1000 // refill carol... (new bucket anyway)
    carol.sql("INSERT INTO t VALUES (100)") // 1 token despite the nested body
    assert(e.sql("SELECT COUNT(*) AS n FROM audit_t").collect().head.getLong(0) === 1L)

    // OFF restores unlimited
    e.sql("SET RATE_LIMIT OFF")
    for (_ <- 1 to 10) alice.sql("SELECT 1 AS x")
    e.close()
  }
}
