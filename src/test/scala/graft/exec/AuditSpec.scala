package graft.exec

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Statement auditing (audit.rs:14-60, 247, 504): SET AUDIT ON records
  * every later statement — action, object, session user, affected
  * rows, and failures — into immutable JSONL parts under the base dir;
  * SHOW AUDIT reads the ordered feed; ids survive engine reopen.
  */
class AuditSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("audited statements record action/object/rows; failures record ok=false") {
    val e = QueryEngine.scratch(spark)
    e.sql("SET AUDIT ON")
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY, v STRING)")
    e.sql("INSERT INTO t VALUES (1, 'a'), (2, 'b')")
    e.sql("UPDATE t SET v = 'x' WHERE k = 1")
    intercept[IllegalArgumentException] {
      e.sql("INSERT INTO t VALUES (1, 'dup')") // pk violation
    }
    e.sql("DELETE FROM t WHERE k = 2")
    val rows = e.sql("SHOW AUDIT")
      .select("audit_id", "user", "action", "object", "n_affected", "ok")
      .collect().toSeq
    assert(rows === Seq(
      Row(1L, "root", "CREATE TABLE", "t", 0L, true),
      Row(2L, "root", "INSERT", "t", 2L, true),
      Row(3L, "root", "UPDATE", "t", 1L, true),
      Row(4L, "root", "INSERT", "t", null, false),
      Row(5L, "root", "DELETE", "t", 1L, true)))
    // the failed insert carries its error text
    val err = e.sql("SHOW AUDIT").where("audit_id = 4")
      .collect().head.getString(6)
    assert(err != null && err.contains("primary key"))
  }

  test("audit off by default; SET AUDIT OFF is the last record; ids survive reopen") {
    val dir = java.nio.file.Files.createTempDirectory("graft-audit-").toString
    val e = new QueryEngine(spark, dir)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY)") // not audited
    e.sql("SET AUDIT ON") // not audited (flag read before dispatch)
    e.sql("INSERT INTO t VALUES (1)")
    e.sql("SET AUDIT OFF") // audited (flag was on entering the statement)
    e.sql("INSERT INTO t VALUES (2)") // not audited
    e.close() // flushes
    val e2 = new QueryEngine(spark, dir)
    assert(e2.sql("SHOW AUDIT").select("audit_id", "action").collect().toSeq
      === Seq(Row(1L, "INSERT"), Row(2L, "SETAUDIT")))
    e2.sql("SET AUDIT ON")
    e2.sql("INSERT INTO t VALUES (3)")
    // the reopened engine continues the id sequence from disk
    assert(e2.sql("SHOW AUDIT").count() === 3L)
    assert(e2.sql("SHOW AUDIT").where("audit_id = 3")
      .select("action").collect() === Array(Row("INSERT")))
    e2.close()
  }

  test("audit records the session user; nested trigger statements audited") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY)")
    e.sql("CREATE TABLE log (k BIGINT PRIMARY KEY)")
    e.sql("""CREATE TRIGGER trg AFTER INSERT ON t EXECUTE
            |INSERT INTO log SELECT COUNT(*) FROM new_rows""".stripMargin)
    e.sql("SET AUDIT ON")
    val s = e.newSession()
    s.sql("SET ROLE alice")
    s.sql("INSERT INTO t VALUES (10)")
    val rows = e.sql("SHOW AUDIT").select("user", "action", "object")
      .collect().toSeq
    // alice's SET ROLE + her INSERT + the trigger's nested INSERT
    assert(rows === Seq(
      Row("alice", "SET ROLE", ""),
      Row("alice", "INSERT", "log"), // nested statement completes first
      Row("alice", "INSERT", "t")))
    e.close()
  }
}
