package graft.exec

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Table privileges (auth.rs:32-120 Permission, :647 check_permission):
  * the SET PRIVILEGES gate, GRANT/REVOKE for SELECT/INSERT/UPDATE/
  * DELETE/ALL, grants to users, roles, and PUBLIC, superuser bypass,
  * and catalog persistence.
  */
class GrantsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def fresh(): QueryEngine = {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY, v STRING)")
    e.sql("INSERT INTO t VALUES (1, 'a'), (2, 'b')")
    e
  }

  test("gate off: everyone can do everything; on: default deny for non-superusers") {
    val e = fresh()
    val alice = e.newSession(); alice.setAuth("alice")
    assert(alice.sql("SELECT COUNT(*) AS n FROM t").collect() === Array(Row(2L)))
    e.sql("SET PRIVILEGES ON")
    intercept[SecurityException] { alice.sql("SELECT COUNT(*) AS n FROM t") }
    intercept[SecurityException] { alice.sql("INSERT INTO t VALUES (3, 'c')") }
    intercept[SecurityException] { alice.sql("UPDATE t SET v = 'x'") }
    intercept[SecurityException] { alice.sql("DELETE FROM t") }
    // superuser unaffected
    assert(e.sql("SELECT COUNT(*) AS n FROM t").collect() === Array(Row(2L)))
  }

  test("per-privilege grants are independent; ALL covers the four; REVOKE removes") {
    val e = fresh()
    e.sql("SET PRIVILEGES ON")
    e.sql("GRANT SELECT, UPDATE ON t TO alice")
    val alice = e.newSession(); alice.setAuth("alice")
    assert(alice.sql("SELECT COUNT(*) AS n FROM t").collect() === Array(Row(2L)))
    alice.sql("UPDATE t SET v = 'x' WHERE k = 1")
    intercept[SecurityException] { alice.sql("DELETE FROM t WHERE k = 1") }
    intercept[SecurityException] { alice.sql("INSERT INTO t VALUES (3, 'c')") }
    e.sql("GRANT ALL ON t TO bob")
    val bob = e.newSession(); bob.setAuth("bob")
    bob.sql("INSERT INTO t VALUES (3, 'c')")
    bob.sql("DELETE FROM t WHERE k = 3")
    e.sql("REVOKE UPDATE ON t FROM alice")
    intercept[SecurityException] { alice.sql("UPDATE t SET v = 'y'") }
    assert(alice.sql("SELECT COUNT(*) AS n FROM t").collect() === Array(Row(2L)))
    e.sql("REVOKE ALL ON t FROM bob")
    intercept[SecurityException] { bob.sql("SELECT COUNT(*) AS n FROM t") }
  }

  test("COPY FROM needs the INSERT privilege like a plain INSERT") {
    val e = fresh()
    val dir = java.nio.file.Files.createTempDirectory("graft-copy-priv-")
    val f = dir.resolve("rows.jsonl")
    java.nio.file.Files.write(f,
      """{"k": 10, "v": "j"}""".getBytes("UTF-8"))
    e.sql("SET PRIVILEGES ON")
    val alice = e.newSession(); alice.setAuth("alice")
    intercept[SecurityException] { alice.sql(s"COPY t FROM '$f'") }
    e.sql("GRANT INSERT ON t TO alice")
    alice.sql(s"COPY t FROM '$f'")
    assert(e.sql("SELECT COUNT(*) AS n FROM t").collect() === Array(Row(3L)))
  }

  test("role and PUBLIC grants; only superusers manage grants") {
    val e = fresh()
    e.sql("SET PRIVILEGES ON")
    e.sql("GRANT SELECT ON t TO analyst") // a role name
    val carol = e.newSession(); carol.setAuth("carol", roles = Set("analyst"))
    assert(carol.sql("SELECT COUNT(*) AS n FROM t").collect() === Array(Row(2L)))
    intercept[SecurityException] { carol.sql("GRANT DELETE ON t TO carol") }
    intercept[SecurityException] { carol.sql("SET PRIVILEGES OFF") }
    e.sql("GRANT INSERT ON t TO PUBLIC")
    val dave = e.newSession(); dave.setAuth("dave")
    dave.sql("INSERT INTO t VALUES (9, 'z')")
    intercept[SecurityException] { dave.sql("SELECT COUNT(*) AS n FROM t") }
  }

  test("grants persist across reopen; SHOW GRANTS lists them; DROP TABLE clears") {
    val dir = java.nio.file.Files.createTempDirectory("graft-grants-").toString
    val e = new QueryEngine(spark, dir)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY)")
    e.sql("GRANT SELECT ON t TO alice")
    e.sql("GRANT ALL ON t TO bob")
    e.close()
    val e2 = new QueryEngine(spark, dir)
    assert(e2.sql("SHOW GRANTS").collect().toSeq.map(_.toString).sorted === Seq(
      Row("t", "ALL", "bob").toString, Row("t", "SELECT", "alice").toString))
    e2.sql("DROP TABLE t")
    assert(e2.sql("SHOW GRANTS").count() === 0L)
    e2.close()
  }

  test("VACUUM RETAIN and OPTIMIZE are superuser-only under the gate") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY)")
    e.sql("INSERT INTO t VALUES (1), (2)")
    e.sql("GRANT ALL ON t TO alice")
    e.sql("SET PRIVILEGES ON")
    val alice = e.newSession(); alice.setAuth("alice")
    // full DML rights do NOT include destroying shared history or
    // rewriting the shared checkpoint layout
    intercept[SecurityException] { alice.sql("VACUUM t RETAIN @SEQ:1") }
    intercept[SecurityException] { alice.sql("OPTIMIZE t") }
    // the superuser session can
    e.sql("OPTIMIZE t")
    e.sql("VACUUM t RETAIN @SEQ:2")
    assert(e.sql("SELECT COUNT(*) AS n FROM t").collect().head.getLong(0) === 2L)
    e.close()
  }
}
