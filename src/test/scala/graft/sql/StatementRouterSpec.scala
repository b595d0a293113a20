package graft.sql

import org.scalatest.funsuite.AnyFunSuite

class StatementRouterSpec extends AnyFunSuite {
  import Statement._

  test("CREATE TABLE with inline primary key and parameterized types") {
    val s = StatementRouter.parse(
      "CREATE TABLE acct (k BIGINT PRIMARY KEY, bal DECIMAL(12,2), status STRING)")
    assert(s === CreateTable("acct",
      Seq(("k", "BIGINT"), ("bal", "DECIMAL(12,2)"), ("status", "STRING")), "k"))
  }

  test("CREATE TABLE with trailing PRIMARY KEY constraint") {
    val s = StatementRouter.parse(
      "CREATE TABLE t (a INT, b STRING, PRIMARY KEY (a))")
    assert(s === CreateTable("t", Seq(("a", "INT"), ("b", "STRING")), "a"))
  }

  test("CREATE TABLE without a pk is rejected") {
    assertThrows[IllegalArgumentException](
      StatementRouter.parse("CREATE TABLE t (a INT, b STRING)"))
  }

  test("INSERT VALUES — multi-row, with and without column list") {
    val s = StatementRouter.parse(
      "INSERT INTO t (a, b) VALUES (1, 'x'), (2, 'y,z')")
    assert(s === InsertValues("t", Some(Seq("a", "b")),
      "VALUES (1, 'x'), (2, 'y,z')"))
    val s2 = StatementRouter.parse("INSERT INTO t VALUES (1, 2)")
    assert(s2 === InsertValues("t", None, "VALUES (1, 2)"))
  }

  test("INSERT ... SELECT") {
    val s = StatementRouter.parse(
      "INSERT INTO t SELECT a, b FROM src WHERE a > 3")
    assert(s === InsertSelect("t", None, "SELECT a, b FROM src WHERE a > 3"))
  }

  test("UPDATE with assignments referencing old values and a WHERE") {
    val s = StatementRouter.parse(
      "UPDATE t SET a = a + 1, b = concat(b, 'x') WHERE a < 10 AND b <> 'q'")
    assert(s === Update("t",
      Seq(("a", "a + 1"), ("b", "concat(b, 'x')")),
      Some("a < 10 AND b <> 'q'")))
  }

  test("UPDATE without WHERE") {
    assert(StatementRouter.parse("UPDATE t SET a = 0") ===
      Update("t", Seq(("a", "0")), None))
  }

  test("DELETE with and without WHERE") {
    assert(StatementRouter.parse("DELETE FROM t WHERE k % 10 = 0") ===
      Delete("t", Some("k % 10 = 0")))
    assert(StatementRouter.parse("DELETE FROM t") === Delete("t", None))
  }

  test("utility statements") {
    assert(StatementRouter.parse("VACUUM t") === Snapshot("t"))
    assert(StatementRouter.parse("CHECKPOINT TABLE t") === Snapshot("t"))
    assert(StatementRouter.parse("SNAPSHOT t") === Snapshot("t"))
    assert(StatementRouter.parse("TRUNCATE TABLE t") === Truncate("t"))
    assert(StatementRouter.parse("ANALYZE TABLE t") === Analyze("t"))
    assert(StatementRouter.parse("SHOW TABLES") === ShowTables)
    assert(StatementRouter.parse("DESCRIBE t") === Describe("t"))
    assert(StatementRouter.parse("COPY t FROM '/tmp/x.jsonl'") ===
      CopyFrom("t", "/tmp/x.jsonl"))
  }

  test("COPY ... TO splits at the top-level TO, not one inside a literal") {
    assert(StatementRouter.parse("COPY t TO '/tmp/out'") ===
      CopyTo("t", "/tmp/out", None, Nil))
    assert(StatementRouter.parse(
      "COPY (SELECT * FROM t) TO '/tmp/out' (FORMAT parquet, ZORDER (a, b))") ===
      CopyTo("(SELECT * FROM t)", "/tmp/out", Some("parquet"), Seq("a", "b")))
    // a " TO '...'" inside the query's string literal must not become
    // the destination split (the old regex was quote-blind)
    assert(StatementRouter.parse(
      "COPY (SELECT ' TO ''/etc/x''' AS s, v FROM t) TO '/tmp/safe'") ===
      CopyTo("(SELECT ' TO ''/etc/x''' AS s, v FROM t)", "/tmp/safe", None, Nil))
    // ...nor may a TO inside the subquery's parens (a lateral alias)
    assert(StatementRouter.parse(
      "COPY (SELECT a TO_also, v FROM t) TO '/tmp/b'") match {
      case CopyTo(src, "/tmp/b", None, Nil) => src.startsWith("(")
      case _ => false
    })
  }

  test("EXPLAIN wraps the inner query") {
    assert(StatementRouter.parse("EXPLAIN SELECT * FROM t") ===
      Explain("SELECT * FROM t", analyze = false))
    assert(StatementRouter.parse("EXPLAIN ANALYZE SELECT 1") ===
      Explain("SELECT 1", analyze = true))
  }

  test("DDL: drop / alter") {
    assert(StatementRouter.parse("DROP TABLE IF EXISTS t") === DropTable("t", true))
    assert(StatementRouter.parse("DROP VIEW v") === DropView("v", false))
    assert(StatementRouter.parse("ALTER TABLE t ADD COLUMN c DOUBLE") ===
      AlterAdd("t", "c", "DOUBLE"))
    assert(StatementRouter.parse("ALTER TABLE t RENAME COLUMN a TO z") ===
      AlterRename("t", "a", "z"))
    assert(StatementRouter.parse("ALTER TABLE t DROP COLUMN b") ===
      AlterDrop("t", "b"))
  }

  test("SELECT and WITH fall through as queries") {
    assert(StatementRouter.parse("SELECT 1") === Select("SELECT 1"))
    assert(StatementRouter.parse("WITH c AS (SELECT 1 AS x) SELECT * FROM c") ===
      Select("WITH c AS (SELECT 1 AS x) SELECT * FROM c"))
  }

  test("splitTopLevel respects parens and string literals") {
    assert(StatementRouter.splitTopLevel("a DECIMAL(12,2), b STRING") ===
      Seq("a DECIMAL(12,2)", "b STRING"))
    assert(StatementRouter.splitTopLevel("'x,y', f(1,2), z") ===
      Seq("'x,y'", "f(1,2)", "z"))
    assert(StatementRouter.splitTopLevel("'it''s, ok', 2") ===
      Seq("'it''s, ok'", "2"))
  }
}
