package graft.exec

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** SHOW CREATE TABLE emits DDL the router itself re-parses: the
  * round-trip table must carry the same columns, constraints, FK
  * enforcement, and AUTO_INCREMENT behavior as the original.
  */
class ShowCreateSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("SHOW CREATE TABLE round-trips through the parser with equivalent behavior") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE dept (id BIGINT PRIMARY KEY, dname STRING NOT NULL)")
    e.sql("""CREATE TABLE emp (id BIGINT PRIMARY KEY AUTO_INCREMENT,
            |ename STRING NOT NULL DEFAULT 'anon',
            |dept BIGINT REFERENCES dept(id),
            |grade BIGINT,
            |UNIQUE (ename),
            |CHECK (grade IS NULL OR grade > 0))""".stripMargin.replace("\n", " "))
    val ddl = e.sql("SHOW CREATE TABLE emp").collect().head.getString(1)
    assert(ddl.startsWith("CREATE TABLE emp ("), ddl)

    // re-create under a new name in a fresh engine from the emitted DDL
    val e2 = QueryEngine.scratch(spark)
    e2.sql("CREATE TABLE dept (id BIGINT PRIMARY KEY, dname STRING NOT NULL)")
    e2.sql("INSERT INTO dept VALUES (10, 'eng')")
    e2.sql(ddl)
    // AUTO_INCREMENT works
    e2.sql("INSERT INTO emp (ename, dept, grade) VALUES ('ann', 10, 3)")
    // DEFAULT fills, FK enforces, CHECK vetoes, UNIQUE vetoes
    e2.sql("INSERT INTO emp (dept, grade) VALUES (10, 1)")
    assert(e2.sql("SELECT ename FROM emp WHERE ename = 'anon'").count() === 1L)
    intercept[IllegalArgumentException] {
      e2.sql("INSERT INTO emp (ename, dept, grade) VALUES ('bob', 99, 1)")
    }
    intercept[IllegalArgumentException] {
      e2.sql("INSERT INTO emp (ename, dept, grade) VALUES ('carl', 10, -5)")
    }
    intercept[IllegalArgumentException] {
      e2.sql("INSERT INTO emp (ename, dept, grade) VALUES ('ann', 10, 2)")
    }
    assert(e2.sql("SELECT COUNT(*) AS n FROM emp").collect().head.getLong(0) === 2L)
    e.close(); e2.close()
  }
}
