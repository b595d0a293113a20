package graft.exec

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** SHOW STATS / SHOW HISTOGRAM (stats.rs:1-60): ANALYZE captures
  * per-column null counts, NDV, min/max, and equi-width histograms for
  * numeric columns; the SHOW surfaces expose them, computing on demand
  * when a table was never analyzed, and are gated on SELECT.
  */
class StatsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def freshEngine() = {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE m (k BIGINT PRIMARY KEY, v DOUBLE, s STRING)")
    e.sql("""INSERT INTO m VALUES
            |(1, 0.0, 'a'), (2, 10.0, 'b'), (3, 20.0, 'a'),
            |(4, 100.0, NULL), (5, NULL, 'c')""".stripMargin)
    e
  }

  test("SHOW STATS: null counts, ndv, min/max per column") {
    val e = freshEngine()
    val rows = e.sql("SHOW STATS FOR m").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("k", "v", "s"))
    // every row carries the table cardinality
    assert(rows.values.forall(_.getLong(1) === 5L))
    assert(rows("k").getLong(2) === 0L) // null_count
    assert(rows("v").getLong(2) === 1L)
    assert(rows("s").getLong(2) === 1L)
    assert(rows("k").getLong(3) === 5L) // ndv (exact at this size)
    assert(rows("s").getLong(3) === 3L)
    assert(rows("v").getString(4).toDouble === 0.0) // min
    assert(rows("v").getString(5).toDouble === 100.0) // max
    assert(rows("s").getString(4) === "a" && rows("s").getString(5) === "c")
  }

  test("SHOW HISTOGRAM: 10 equi-width buckets covering [min,max], counts sum to non-nulls") {
    val e = freshEngine()
    val h = e.sql("SHOW HISTOGRAM m v").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(h.length === 10)
    assert(h.head._2 === 0.0 && h.last._3 === 100.0)
    assert(h.map(_._4).sum === 4L) // nulls excluded
    // exact placement: floor((x-0)/100*10) -> 0.0->b0, 10.0->b1,
    // 20.0->b2, 100.0->b10 clamped to b9
    assert(h(0)._4 === 1L && h(1)._4 === 1L && h(2)._4 === 1L)
    assert(h.last._4 === 1L)
    // contiguous bucket bounds
    h.sliding(2).foreach { case Array(a, b) => assert(a._3 === b._2) }
  }

  test("ANALYZE refreshes; SHOW computes on demand without prior ANALYZE") {
    val e = freshEngine()
    // no ANALYZE yet: SHOW STATS computes on demand
    assert(e.sql("SHOW STATS m").collect().length === 3)
    e.sql("INSERT INTO m VALUES (6, 50.0, 'd')")
    // stale until re-ANALYZE (session-lived cache)
    val before = e.sql("SHOW STATS m").collect().head.getLong(1)
    assert(before === 5L)
    e.sql("ANALYZE m")
    val after = e.sql("SHOW STATS m").collect().head.getLong(1)
    assert(after === 6L)
  }

  test("constant and non-numeric columns") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE c (k BIGINT PRIMARY KEY, x BIGINT)")
    e.sql("INSERT INTO c VALUES (1, 7), (2, 7), (3, 7)")
    // constant column: all mass in bucket 0, zero-width bounds
    val h = e.sql("SHOW HISTOGRAM c x").collect()
    assert(h.map(_.getLong(3)).sum === 3L && h.head.getLong(3) === 3L)
    // text column has no histogram
    e.sql("CREATE TABLE s2 (k BIGINT PRIMARY KEY, t STRING)")
    e.sql("INSERT INTO s2 VALUES (1, 'x')")
    intercept[IllegalArgumentException] { e.sql("SHOW HISTOGRAM s2 t") }
    intercept[IllegalArgumentException] { e.sql("SHOW HISTOGRAM s2 nope") }
  }

  test("SHOW STATS is gated on SELECT privilege") {
    val e = freshEngine()
    e.sql("SET PRIVILEGES ON")
    val s = e.newSession(); s.setAuth("intern")
    intercept[SecurityException] { s.sql("SHOW STATS FOR m") }
    intercept[SecurityException] { s.sql("SHOW HISTOGRAM m v") }
    e.sql("GRANT SELECT ON m TO intern")
    assert(s.sql("SHOW STATS FOR m").collect().length === 3)
  }
}
