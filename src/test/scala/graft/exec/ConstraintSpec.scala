package graft.exec

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Declared column/table constraints (constraints.rs:9-35, enforcement
  * 330-520): NOT NULL, DEFAULT, UNIQUE (single + multi-column, NULLS
  * DISTINCT), CHECK (TRUE-or-NULL passes). All guards are set-based —
  * one probe job per statement — and a violating statement leaves no
  * partial state.
  */
class ConstraintSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def fresh(): QueryEngine = {
    val e = QueryEngine.scratch(spark)
    e.sql("""CREATE TABLE acct (
            |  k BIGINT PRIMARY KEY,
            |  bal DOUBLE NOT NULL CHECK (bal >= 0),
            |  status STRING DEFAULT 'new',
            |  email STRING UNIQUE)""".stripMargin)
    e
  }

  private def rows(e: QueryEngine, q: String): Seq[Row] = e.sql(q).collect().toSeq

  test("DEFAULT fills omitted columns; explicit NULL stays NULL") {
    val e = fresh()
    e.sql("INSERT INTO acct (k, bal, email) VALUES (1, 10.0, 'a@x')")
    e.sql("INSERT INTO acct VALUES (2, 20.0, NULL, 'b@x')")
    assert(rows(e, "SELECT k, status FROM acct ORDER BY k")
      === Seq(Row(1L, "new"), Row(2L, null)))
  }

  test("NOT NULL rejects both a NULL literal and an omitted column") {
    val e = fresh()
    val ex = intercept[IllegalArgumentException] {
      e.sql("INSERT INTO acct VALUES (1, NULL, 'x', 'a@x')")
    }
    assert(ex.getMessage.contains("NOT NULL"))
    intercept[IllegalArgumentException] {
      e.sql("INSERT INTO acct (k, email) VALUES (1, 'a@x')") // bal omitted, no default
    }
    assert(rows(e, "SELECT COUNT(*) AS n FROM acct") === Seq(Row(0L)))
  }

  test("CHECK rejects false, passes TRUE and NULL results") {
    val e = fresh()
    val ex = intercept[IllegalArgumentException] {
      e.sql("INSERT INTO acct VALUES (1, -5.0, 'x', 'a@x')")
    }
    assert(ex.getMessage.contains("CHECK"))
    // bal NOT NULL keeps the NULL-passes case off this table; cover it
    // on a table whose CHECK column is nullable
    e.sql("CREATE TABLE lim (id BIGINT PRIMARY KEY, v DOUBLE CHECK (v < 100))")
    e.sql("INSERT INTO lim VALUES (1, NULL)") // NULL check result passes
    e.sql("INSERT INTO lim VALUES (2, 50.0)")
    intercept[IllegalArgumentException] { e.sql("INSERT INTO lim VALUES (3, 200.0)") }
    assert(rows(e, "SELECT COUNT(*) AS n FROM lim") === Seq(Row(2L)))
  }

  test("UNIQUE rejects batch and state duplicates; NULLs never conflict") {
    val e = fresh()
    e.sql("INSERT INTO acct VALUES (1, 1.0, 'a', 'dup@x')")
    intercept[IllegalArgumentException] {
      e.sql("INSERT INTO acct VALUES (2, 2.0, 'b', 'dup@x')") // state clash
    }
    intercept[IllegalArgumentException] {
      e.sql("INSERT INTO acct VALUES (3, 3.0, 'c', 'e@x'), (4, 4.0, 'd', 'e@x')")
    }
    e.sql("INSERT INTO acct VALUES (5, 5.0, 'e', NULL), (6, 6.0, 'f', NULL)")
    assert(rows(e, "SELECT COUNT(*) AS n FROM acct") === Seq(Row(3L)))
  }

  test("UPDATE enforces CHECK, NOT NULL, and UNIQUE against survivors") {
    val e = fresh()
    e.sql("INSERT INTO acct VALUES (1, 1.0, 'a', 'a@x'), (2, 2.0, 'b', 'b@x')")
    intercept[IllegalArgumentException] { e.sql("UPDATE acct SET bal = -1 WHERE k = 1") }
    intercept[IllegalArgumentException] { e.sql("UPDATE acct SET bal = NULL WHERE k = 1") }
    intercept[IllegalArgumentException] {
      e.sql("UPDATE acct SET email = 'b@x' WHERE k = 1") // clashes with k=2
    }
    // moving the value off the old row and onto another in one statement
    // is fine for the survivor check (both rows are in the batch)
    e.sql("UPDATE acct SET email = CASE WHEN k = 1 THEN 'b@x' ELSE 'a@x' END")
    assert(rows(e, "SELECT k, email FROM acct ORDER BY k")
      === Seq(Row(1L, "b@x"), Row(2L, "a@x")))
    // an update not touching the unique column skips its probe but
    // still lands
    e.sql("UPDATE acct SET status = 'vip' WHERE k = 2")
    assert(rows(e, "SELECT status FROM acct WHERE k = 2") === Seq(Row("vip")))
  }

  test("multi-column UNIQUE at table level") {
    val e = QueryEngine.scratch(spark)
    e.sql("""CREATE TABLE pairs (id BIGINT PRIMARY KEY, a STRING, b STRING,
            |  UNIQUE (a, b))""".stripMargin)
    e.sql("INSERT INTO pairs VALUES (1, 'x', 'y'), (2, 'x', 'z')")
    intercept[IllegalArgumentException] {
      e.sql("INSERT INTO pairs VALUES (3, 'x', 'y')")
    }
    e.sql("INSERT INTO pairs VALUES (4, 'x', NULL), (5, 'x', NULL)") // NULLS DISTINCT
    assert(rows(e, "SELECT COUNT(*) AS n FROM pairs") === Seq(Row(4L)))
  }

  test("table-level CHECK and pk-changing update keep enforcing") {
    val e = QueryEngine.scratch(spark)
    e.sql("""CREATE TABLE rng (id BIGINT PRIMARY KEY, lo BIGINT, hi BIGINT,
            |  CHECK (lo <= hi))""".stripMargin)
    e.sql("INSERT INTO rng VALUES (1, 1, 10)")
    intercept[IllegalArgumentException] { e.sql("INSERT INTO rng VALUES (2, 9, 3)") }
    // pk-changing update path also probes constraints
    intercept[IllegalArgumentException] {
      e.sql("UPDATE rng SET id = 5, lo = 100 WHERE id = 1")
    }
    assert(rows(e, "SELECT id, lo, hi FROM rng ORDER BY id") === Seq(Row(1L, 1L, 10L)))
  }

  test("constraints persist across engine restart and survive rename") {
    val e = fresh()
    e.sql("INSERT INTO acct (k, bal, email) VALUES (1, 1.0, 'a@x')")
    e.close() // hand the base-dir write lock to the next engine
    val e2 = new QueryEngine(spark, e.baseDir)
    intercept[IllegalArgumentException] {
      e2.sql("INSERT INTO acct VALUES (2, -1.0, 'x', 'b@x')") // CHECK survived
    }
    e2.sql("ALTER TABLE acct RENAME COLUMN email TO mail")
    intercept[IllegalArgumentException] {
      e2.sql("INSERT INTO acct VALUES (3, 1.0, 'x', 'a@x')") // UNIQUE follows rename
    }
    // renaming a CHECK-referenced column is rejected, not silently broken
    intercept[IllegalArgumentException] {
      e2.sql("ALTER TABLE acct RENAME COLUMN bal TO balance")
    }
    e2.sql("INSERT INTO acct (k, bal, mail) VALUES (4, 4.0, 'd@x')")
    assert(rows(e2, "SELECT COUNT(*) AS n FROM acct") === Seq(Row(2L)))
  }
}
