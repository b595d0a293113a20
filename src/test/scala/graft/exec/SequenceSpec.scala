package graft.exec

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Sequences (sequences.rs:8-213): CREATE SEQUENCE with
  * START/INCREMENT/MINVALUE/MAXVALUE/CYCLE, nextval/currval draws,
  * ALTER SEQUENCE RESTART, DROP SEQUENCE, AUTO_INCREMENT columns
  * filled by block reservation, persistence across engine reopen, and
  * non-transactional draw semantics (a ROLLBACK keeps drawn values).
  */
class SequenceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def one(e: QueryEngine, q: String): Long =
    e.sql(q).collect()(0).getLong(0)

  test("nextval draws start, start+inc, ...; currval repeats the last draw") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE SEQUENCE s START 10 INCREMENT 5")
    assert(one(e, "SELECT nextval('s') AS v") === 10L)
    assert(one(e, "SELECT nextval('s') AS v") === 15L)
    assert(one(e, "SELECT currval('s') AS v") === 15L)
    assert(one(e, "SELECT nextval('s') AS v") === 20L)
  }

  test("MAXVALUE without CYCLE exhausts; with CYCLE wraps to MINVALUE") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE SEQUENCE bounded START 1 INCREMENT 2 MINVALUE 1 MAXVALUE 5")
    assert(one(e, "SELECT nextval('bounded') AS v") === 1L)
    assert(one(e, "SELECT nextval('bounded') AS v") === 3L)
    assert(one(e, "SELECT nextval('bounded') AS v") === 5L)
    val ex = intercept[IllegalArgumentException] {
      e.sql("SELECT nextval('bounded') AS v").collect()
    }
    assert(ex.getMessage.contains("exceeded maximum"))
    e.sql("CREATE SEQUENCE wheel START 1 INCREMENT 2 MINVALUE 1 MAXVALUE 5 CYCLE")
    assert((1 to 4).map(_ => one(e, "SELECT nextval('wheel') AS v"))
      === Seq(1L, 3L, 5L, 1L))
  }

  test("descending sequence with defaults; RESTART WITH re-aims the next draw") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE SEQUENCE down INCREMENT BY -3 START WITH 9")
    assert(one(e, "SELECT nextval('down') AS v") === 9L)
    assert(one(e, "SELECT nextval('down') AS v") === 6L)
    e.sql("ALTER SEQUENCE down RESTART WITH 100")
    assert(one(e, "SELECT nextval('down') AS v") === 100L)
    e.sql("ALTER SEQUENCE down RESTART")
    assert(one(e, "SELECT nextval('down') AS v") === 9L)
  }

  test("draws are non-transactional: ROLLBACK keeps the burned values") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE SEQUENCE s")
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY, v BIGINT)")
    e.sql("BEGIN")
    e.sql("INSERT INTO t VALUES (1, nextval('s')), (2, nextval('s'))")
    e.sql("ROLLBACK")
    assert(one(e, "SELECT nextval('s') AS v") === 3L) // 1 and 2 burned
    assert(e.sql("SELECT * FROM t").count() === 0L)
  }

  test("AUTO_INCREMENT fills the omitted column gaplessly via block reservation") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE users (id BIGINT AUTO_INCREMENT PRIMARY KEY, name STRING)")
    e.sql("INSERT INTO users (name) VALUES ('a'), ('b'), ('c')")
    e.sql("INSERT INTO users (name) VALUES ('d')")
    assert(e.sql("SELECT id, name FROM users ORDER BY id").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1))).sorted
      === Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).sorted)
    // an explicit id wins over the fill and later fills continue past it
    e.sql("INSERT INTO users (id, name) VALUES (100, 'x')")
    e.sql("INSERT INTO users (name) VALUES ('e')")
    assert(one(e, "SELECT id FROM users WHERE name = 'e'") === 5L)
  }

  test("sequences persist across engine reopen; DROP TABLE drops owned sequences") {
    val dir = java.nio.file.Files.createTempDirectory("graft-seq").toString
    val e1 = new QueryEngine(spark, dir)
    e1.sql("CREATE SEQUENCE s START 7")
    e1.sql("SELECT nextval('s') AS v").collect()
    e1.sql("CREATE TABLE users (id BIGINT AUTO_INCREMENT PRIMARY KEY, name STRING)")
    e1.sql("INSERT INTO users (name) VALUES ('a'), ('b')")
    e1.close()
    val e2 = new QueryEngine(spark, dir)
    assert(one(e2, "SELECT nextval('s') AS v") === 8L)
    e2.sql("INSERT INTO users (name) VALUES ('c')")
    assert(one(e2, "SELECT id FROM users WHERE name = 'c'") === 3L)
    e2.sql("DROP TABLE users")
    assert(e2.sql("SHOW SEQUENCES").collect().map(_.getString(0)).toSeq === Seq("s"))
    e2.close()
  }

  test("nextval in INSERT ... SELECT is rejected with a pointer to AUTO_INCREMENT") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE SEQUENCE s")
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY, v BIGINT)")
    val ex = intercept[IllegalArgumentException] {
      e.sql("INSERT INTO t SELECT nextval('s'), 1")
    }
    assert(ex.getMessage.contains("AUTO_INCREMENT"))
    // a literal mentioning nextval is NOT a draw
    e.sql("INSERT INTO t VALUES (1, 0)")
    e.sql("UPDATE t SET v = length('nextval(''s'')') WHERE k = 1")
    assert(one(e, "SELECT nextval('s') AS v") === 1L) // first real draw
  }

  test("DROP SEQUENCE removes it; IF EXISTS tolerates absence; dup create raises") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE SEQUENCE s")
    intercept[IllegalArgumentException](e.sql("CREATE SEQUENCE s"))
    e.sql("DROP SEQUENCE s")
    intercept[IllegalArgumentException](e.sql("SELECT nextval('s') AS v").collect())
    e.sql("DROP SEQUENCE IF EXISTS s")
    intercept[IllegalArgumentException](e.sql("DROP SEQUENCE s"))
    intercept[IllegalArgumentException](e.sql("CREATE SEQUENCE z INCREMENT 0"))
    intercept[IllegalArgumentException](
      e.sql("CREATE SEQUENCE z MINVALUE 5 MAXVALUE 5"))
  }
}
