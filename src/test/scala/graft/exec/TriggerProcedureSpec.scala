package graft.exec

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Trigger FIRING semantics (triggers.rs:332-543) and stored
  * procedures with CALL (procedures.rs:533-630) — round-6 additions on
  * top of the parse-and-record registry. */
class TriggerProcedureSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def audited(): QueryEngine = {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (id BIGINT PRIMARY KEY, grp STRING, val DOUBLE)")
    e.sql("CREATE TABLE audit (aid BIGINT PRIMARY KEY, op STRING, n BIGINT)")
    e
  }

  private def rows(e: QueryEngine, q: String): Seq[Row] =
    e.sql(q).collect().toSeq

  private val nextAid = "(SELECT COALESCE(MAX(aid), 0) + 1 FROM audit)"

  test("AFTER INSERT/UPDATE/DELETE triggers audit the affected batch") {
    val e = audited()
    e.sql(s"""CREATE TRIGGER trg_ins AFTER INSERT ON t EXECUTE
             |INSERT INTO audit SELECT $nextAid, 'ins', COUNT(*) FROM new_rows""".stripMargin)
    e.sql(s"""CREATE TRIGGER trg_upd AFTER UPDATE ON t EXECUTE
             |INSERT INTO audit SELECT $nextAid, 'upd', COUNT(*) FROM new_rows""".stripMargin)
    e.sql(s"""CREATE TRIGGER trg_del AFTER DELETE ON t EXECUTE
             |INSERT INTO audit SELECT $nextAid, 'del', COUNT(*) FROM old_rows""".stripMargin)
    e.sql("INSERT INTO t VALUES (1, 'a', 10), (2, 'a', 20), (3, 'b', 30)")
    e.sql("UPDATE t SET val = val + 1 WHERE grp = 'a'")
    e.sql("DELETE FROM t WHERE id = 3")
    assert(rows(e, "SELECT aid, op, n FROM audit ORDER BY aid")
      === Seq(Row(1L, "ins", 3L), Row(2L, "upd", 2L), Row(3L, "del", 1L)))
    // a statement-level trigger fires even on an empty batch (PG)
    e.sql("DELETE FROM t WHERE id = 999")
    assert(rows(e, "SELECT n FROM audit WHERE aid = 4") === Seq(Row(0L)))
  }

  test("WHEN filters the batch and skips the body when nothing matches") {
    val e = audited()
    e.sql(s"""CREATE TRIGGER trg_big AFTER INSERT ON t WHEN (val > 15) EXECUTE
             |INSERT INTO audit SELECT $nextAid, 'big', COUNT(*) FROM new_rows""".stripMargin)
    e.sql("INSERT INTO t VALUES (1, 'a', 10), (2, 'a', 20), (3, 'b', 30)")
    // new_rows held only the two WHEN-matching rows
    assert(rows(e, "SELECT op, n FROM audit") === Seq(Row("big", 2L)))
    // nothing matches -> the body is skipped entirely
    e.sql("INSERT INTO t VALUES (4, 'c', 1)")
    assert(rows(e, "SELECT COUNT(*) AS n FROM audit") === Seq(Row(1L)))
  }

  test("BEFORE trigger raising vetoes the DML") {
    val e = audited()
    e.sql("INSERT INTO t VALUES (1, 'a', 10)")
    e.sql("""CREATE TRIGGER trg_guard BEFORE DELETE ON t WHEN (grp = 'a') EXECUTE
            |SELECT RAISE_ERROR('protected rows')""".stripMargin)
    val ex = intercept[IllegalStateException](e.sql("DELETE FROM t WHERE id = 1"))
    assert(ex.getMessage.contains("trg_guard"))
    // the veto left the row in place
    assert(rows(e, "SELECT COUNT(*) AS n FROM t") === Seq(Row(1L)))
    // non-matching rows delete fine (WHEN gate skips the guard body)
    e.sql("INSERT INTO t VALUES (2, 'b', 20)")
    e.sql("DELETE FROM t WHERE id = 2")
    assert(rows(e, "SELECT id FROM t") === Seq(Row(1L)))
  }

  test("ALTER TRIGGER DISABLE stops firing; ENABLE resumes; state persists") {
    val e = audited()
    e.sql(s"""CREATE TRIGGER trg_ins AFTER INSERT ON t EXECUTE
             |INSERT INTO audit SELECT $nextAid, 'ins', COUNT(*) FROM new_rows""".stripMargin)
    e.sql("ALTER TRIGGER trg_ins DISABLE")
    e.sql("INSERT INTO t VALUES (1, 'a', 10)")
    assert(rows(e, "SELECT COUNT(*) AS n FROM audit") === Seq(Row(0L)))
    e.close()
    // disabled state survives the restart
    val e2 = new QueryEngine(spark, e.baseDir)
    e2.sql("INSERT INTO t VALUES (2, 'a', 20)")
    assert(rows(e2, "SELECT COUNT(*) AS n FROM audit") === Seq(Row(0L)))
    e2.sql("ALTER TRIGGER trg_ins ENABLE")
    e2.sql("INSERT INTO t VALUES (3, 'a', 30)")
    assert(rows(e2, "SELECT op, n FROM audit") === Seq(Row("ins", 1L)))
    intercept[IllegalArgumentException](e2.sql("ALTER TRIGGER nope ENABLE"))
    e2.close()
  }

  test("trigger body DML inside a transaction rolls back with it") {
    val e = audited()
    e.sql(s"""CREATE TRIGGER trg_ins AFTER INSERT ON t EXECUTE
             |INSERT INTO audit SELECT $nextAid, 'ins', COUNT(*) FROM new_rows""".stripMargin)
    e.sql("BEGIN")
    e.sql("INSERT INTO t VALUES (1, 'a', 10)")
    assert(rows(e, "SELECT COUNT(*) AS n FROM audit") === Seq(Row(1L))) // read-your-writes
    e.sql("ROLLBACK")
    assert(rows(e, "SELECT COUNT(*) AS n FROM audit") === Seq(Row(0L)))
    assert(rows(e, "SELECT COUNT(*) AS n FROM t") === Seq(Row(0L)))
    // and commits with it
    e.sql("BEGIN")
    e.sql("INSERT INTO t VALUES (1, 'a', 10)")
    e.sql("COMMIT")
    assert(rows(e, "SELECT op, n FROM audit") === Seq(Row("ins", 1L)))
  }

  test("recursive trigger chain hits the depth cap instead of looping") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE loopy (id BIGINT PRIMARY KEY)")
    // each firing inserts a fresh pk into the same table -> re-fires
    e.sql("""CREATE TRIGGER trg_loop AFTER INSERT ON loopy EXECUTE
            |INSERT INTO loopy SELECT MAX(id) + 1 FROM new_rows""".stripMargin)
    val ex = intercept[Exception](e.sql("INSERT INTO loopy VALUES (1)"))
    def causes(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => Option(c.getMessage).exists(_.contains("nesting depth"))))
  }

  test("EXECUTE PROCEDURE spelling routes to CALL; procedures persist") {
    val e = audited()
    e.sql(s"""CREATE PROCEDURE log_op(which STRING) AS
             |INSERT INTO audit SELECT $nextAid, $$which, (SELECT COUNT(*) FROM new_rows)""".stripMargin)
    e.sql("CREATE TRIGGER trg_ins AFTER INSERT ON t EXECUTE PROCEDURE log_op('from_trigger')")
    e.sql("INSERT INTO t VALUES (1, 'a', 10), (2, 'b', 20)")
    assert(rows(e, "SELECT op, n FROM audit") === Seq(Row("from_trigger", 2L)))
    e.close()
    val e2 = new QueryEngine(spark, e.baseDir)
    assert(rows(e2, "SHOW PROCEDURES").map(_.getString(0)) === Seq("log_op"))
    e2.sql("DROP PROCEDURE log_op")
    intercept[IllegalArgumentException](e2.sql("DROP PROCEDURE log_op"))
    e2.sql("DROP PROCEDURE IF EXISTS log_op")
    e2.close()
  }

  test("CALL binds named parameters with value semantics") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE acct (k BIGINT PRIMARY KEY, bal DOUBLE, status STRING)")
    e.sql("INSERT INTO acct VALUES (1, 100, 'new'), (2, 9000, 'new'), (3, 50, 'new')")
    e.sql("""CREATE PROCEDURE promote(tier STRING, cutoff DOUBLE) AS
            |UPDATE acct SET status = $tier WHERE bal > $cutoff;
            |DELETE FROM acct WHERE bal < $cutoff / 1000""".stripMargin)
    e.sql("CALL promote('vip', 1000 + 2000)") // args are expressions
    assert(rows(e, "SELECT k, status FROM acct ORDER BY k")
      === Seq(Row(1L, "new"), Row(2L, "vip"), Row(3L, "new")))
    // a malicious string arg stays a literal (render escapes quotes)
    e.sql("CALL promote('x'' OR ''1''=''1', 20000)")
    assert(rows(e, "SELECT COUNT(*) AS n FROM acct WHERE status LIKE 'x%'")
      === Seq(Row(0L))) // no row has bal > 1e9, so nothing was tagged
    assert(rows(e, "SELECT COUNT(*) AS n FROM acct") === Seq(Row(3L)))
    // arity mismatch raises
    intercept[IllegalArgumentException](e.sql("CALL promote('vip')"))
    intercept[IllegalArgumentException](e.sql("CALL nope()"))
  }

  test("procedure body with an unknown $reference raises at CALL") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (id BIGINT PRIMARY KEY)")
    e.sql("CREATE PROCEDURE p(a) AS INSERT INTO t VALUES ($b)")
    val ex = intercept[IllegalArgumentException](e.sql("CALL p(1)"))
    assert(ex.getMessage.contains("$b"))
    // $a inside a string literal is data, not a reference
    e.sql("CREATE OR REPLACE PROCEDURE p(a) AS INSERT INTO t VALUES ($a)")
    e.sql("CALL p(7)")
    assert(rows(e, "SELECT id FROM t") === Seq(Row(7L)))
  }

  test("procedures call procedures; direct recursion hits the cap") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (id BIGINT PRIMARY KEY)")
    e.sql("CREATE PROCEDURE inner_p(x BIGINT) AS INSERT INTO t VALUES ($x)")
    e.sql("CREATE PROCEDURE outer_p(x BIGINT) AS CALL inner_p($x + 1); CALL inner_p($x + 2)")
    e.sql("CALL outer_p(10)")
    assert(rows(e, "SELECT id FROM t ORDER BY id") === Seq(Row(11L), Row(12L)))
    e.sql("CREATE PROCEDURE forever(x BIGINT) AS CALL forever($x)")
    val ex = intercept[IllegalStateException](e.sql("CALL forever(1)"))
    assert(ex.getMessage.contains("nesting depth"))
  }

  test("OR REPLACE swaps a procedure body; typed params parse") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (id BIGINT PRIMARY KEY)")
    e.sql("CREATE PROCEDURE p(IN x BIGINT, y STRING) AS INSERT INTO t VALUES ($x)")
    intercept[IllegalArgumentException](
      e.sql("CREATE PROCEDURE p(z) AS SELECT 1"))
    e.sql("CREATE OR REPLACE PROCEDURE p(x BIGINT) AS INSERT INTO t VALUES ($x * 2)")
    e.sql("CALL p(21)")
    assert(rows(e, "SELECT id FROM t") === Seq(Row(42L)))
  }

  test("malformed trigger bodies are rejected at CREATE") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (id BIGINT PRIMARY KEY)")
    intercept[IllegalArgumentException](
      e.sql("CREATE TRIGGER bad AFTER INSERT ON t DO SOMETHING"))
    intercept[IllegalArgumentException](
      e.sql("CREATE TRIGGER bad AFTER INSERT ON t WHEN (oops EXECUTE SELECT 1"))
    // the FOR EACH forms and bare registration still parse
    e.sql("CREATE TRIGGER ok1 AFTER INSERT ON t FOR EACH ROW EXECUTE SELECT 1")
    e.sql("CREATE TRIGGER ok2 AFTER INSERT ON t")
    assert(rows(e, "SHOW TRIGGERS").size === 2)
  }
}
