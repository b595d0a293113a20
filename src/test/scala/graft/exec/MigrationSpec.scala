package graft.exec

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Versioned migrations (migration.rs:22-64 Version, :99-150
  * Migration, :489 migrate_all, :465 rollback_migration): registration
  * in any order, version-ordered application, idempotent MIGRATE,
  * DOWN-script rollback, persistence, and the status view.
  */
class MigrationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("MIGRATE applies pending migrations in version order, idempotently") {
    val e = QueryEngine.scratch(spark)
    // registered out of order; 0.9.0 must run before 1.0.0
    e.sql("""CREATE MIGRATION '1.0.0' UP
            |INSERT INTO t VALUES (2, 'from-1.0.0')
            |DOWN DELETE FROM t WHERE k = 2""".stripMargin)
    e.sql("""CREATE MIGRATION '0.9.0' UP
            |CREATE TABLE t (k BIGINT PRIMARY KEY, v STRING);
            |INSERT INTO t VALUES (1, 'base')""".stripMargin)
    assert(e.sql("MIGRATE").collect().head.getLong(1) === 2L)
    assert(e.sql("SELECT k, v FROM t ORDER BY k").collect().toSeq
      === Seq(Row(1L, "base"), Row(2L, "from-1.0.0")))
    // idempotent: nothing pending
    assert(e.sql("MIGRATE").collect().head.getLong(1) === 0L)
    // a later registration applies alone
    e.sql("CREATE MIGRATION '1.1.0' UP UPDATE t SET v = 'x' WHERE k = 1")
    assert(e.sql("MIGRATE").collect().head.getLong(1) === 1L)
    assert(e.sql("SELECT v FROM t WHERE k = 1").collect() === Array(Row("x")))
  }

  test("ROLLBACK MIGRATION runs the newest DOWN; no-DOWN and empty raise") {
    val e = QueryEngine.scratch(spark)
    intercept[IllegalStateException] { e.sql("ROLLBACK MIGRATION") }
    e.sql("""CREATE MIGRATION '1.0.0' UP
            |CREATE TABLE t (k BIGINT PRIMARY KEY)""".stripMargin)
    e.sql("""CREATE MIGRATION '1.1.0' UP
            |INSERT INTO t VALUES (7)
            |DOWN DELETE FROM t WHERE k = 7""".stripMargin)
    e.sql("MIGRATE")
    e.sql("ROLLBACK MIGRATION") // 1.1.0's DOWN
    assert(e.sql("SELECT COUNT(*) AS n FROM t").collect() === Array(Row(0L)))
    assert(e.sql("SHOW MIGRATIONS").collect().toSeq
      === Seq(Row("1.0.0", true, false), Row("1.1.0", false, true)))
    // 1.0.0 has no DOWN: rolling it back raises
    intercept[IllegalStateException] { e.sql("ROLLBACK MIGRATION") }
    // a re-MIGRATE re-applies the rolled-back one
    assert(e.sql("MIGRATE").collect().head.getLong(1) === 1L)
    assert(e.sql("SELECT COUNT(*) AS n FROM t").collect() === Array(Row(1L)))
  }

  test("migrations and applied-state persist across reopen; bad versions rejected") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mig-").toString
    val e = new QueryEngine(spark, dir)
    e.sql("CREATE MIGRATION '1.0' UP CREATE TABLE t (k BIGINT PRIMARY KEY)")
    e.sql("MIGRATE")
    intercept[IllegalArgumentException] {
      e.sql("CREATE MIGRATION 'one.two' UP SELECT 1")
    }
    intercept[IllegalArgumentException] {
      e.sql("CREATE MIGRATION '1.0' UP SELECT 1") // duplicate
    }
    e.close()
    val e2 = new QueryEngine(spark, dir)
    assert(e2.sql("SHOW MIGRATIONS").collect().toSeq
      === Seq(Row("1.0", true, false)))
    assert(e2.sql("MIGRATE").collect().head.getLong(1) === 0L)
    // a DOWN containing the word 'down' in a literal doesn't mis-split
    e2.sql("""CREATE MIGRATION '2.0' UP
             |INSERT INTO t VALUES (1)
             |DOWN DELETE FROM t WHERE k = 1""".stripMargin)
    e2.sql("MIGRATE")
    assert(e2.sql("SELECT COUNT(*) AS n FROM t").collect() === Array(Row(1L)))
    e2.close()
  }
}
