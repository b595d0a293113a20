package graft.exec

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Multi-session transactions with snapshot isolation (mvcc.rs,
  * transaction_coordinator.rs:1-441): every session gets its own
  * transaction over shared storage; BEGIN pins a per-table read
  * horizon at first access, reads are repeatable (own writes visible,
  * others' later commits invisible), and COMMIT is first-committer-
  * wins — a write-write conflict on a primary key aborts the loser
  * with a serialization failure (PG 40001).
  */
class MvccSessionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def seeded(): QueryEngine = {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (id BIGINT PRIMARY KEY, v STRING)")
    e.sql("INSERT INTO t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    e
  }

  private def count(s: QueryEngine#Session, where: String = "1=1"): Long =
    s.sql(s"SELECT COUNT(*) AS n FROM t WHERE $where").head().getLong(0)

  test("repeatable read: another session's commit stays invisible mid-txn") {
    val e = seeded()
    val s1 = e.newSession()
    val s2 = e.newSession()
    s1.sql("BEGIN")
    assert(count(s1) === 3L) // pins t's snapshot
    s2.sql("INSERT INTO t VALUES (10, 'x')") // autocommit, durable
    assert(count(s1) === 3L, "snapshot read must not see the later commit")
    assert(count(s2) === 4L, "autocommit session reads latest state")
    s1.sql("COMMIT") // read-only: publishes nothing, no conflict
    assert(count(s1) === 4L, "after COMMIT the session reads latest state")
  }

  test("read-your-writes inside a txn, invisible to other sessions") {
    val e = seeded()
    val s1 = e.newSession()
    val s2 = e.newSession()
    s1.sql("BEGIN")
    s1.sql("INSERT INTO t VALUES (10, 'mine')")
    s1.sql("UPDATE t SET v = 'a2' WHERE id = 1")
    assert(count(s1) === 4L, "own buffered writes are visible")
    assert(s1.sql("SELECT v FROM t WHERE id = 1").head().getString(0) === "a2")
    assert(count(s2) === 3L, "buffered writes leak to no other session")
    s1.sql("COMMIT")
    assert(count(s2) === 4L)
  }

  test("disjoint-key writers both commit; sequences stay unique") {
    val e = seeded()
    val s1 = e.newSession()
    val s2 = e.newSession()
    s1.sql("BEGIN"); s2.sql("BEGIN")
    s1.sql("UPDATE t SET v = 'x1' WHERE id = 1")
    s2.sql("UPDATE t SET v = 'x2' WHERE id = 2")
    s1.sql("COMMIT")
    s2.sql("COMMIT") // disjoint pks — no conflict
    val got = e.sql("SELECT id, v FROM t ORDER BY id").collect().toSeq
    assert(got === Seq(Row(1L, "x1"), Row(2L, "x2"), Row(3L, "c")))
    // history shows one event per sequence (commit re-sequencing held)
    val seqs = e.sql("SELECT sequence FROM t FOR SYSTEM_TIME ALL")
      .collect().map(_.getLong(0)).toSeq
    assert(seqs.distinct.size === seqs.size, s"duplicate sequences: $seqs")
  }

  test("write-write conflict: first committer wins, loser aborts and retries") {
    val e = seeded()
    val s1 = e.newSession()
    val s2 = e.newSession()
    s1.sql("BEGIN"); s2.sql("BEGIN")
    s1.sql("UPDATE t SET v = 'winner' WHERE id = 2")
    s2.sql("UPDATE t SET v = 'loser' WHERE id = 2")
    s1.sql("COMMIT")
    val ex = intercept[QueryEngine.SerializationFailureException] {
      s2.sql("COMMIT")
    }
    assert(ex.getMessage.contains("could not serialize"))
    assert(!s2.inTransaction, "failed COMMIT rolls the transaction back")
    assert(e.sql("SELECT v FROM t WHERE id = 2").head().getString(0) === "winner")
    // the loser retries on a fresh snapshot and succeeds
    s2.sql("BEGIN")
    s2.sql("UPDATE t SET v = 'retry' WHERE id = 2")
    s2.sql("COMMIT")
    assert(e.sql("SELECT v FROM t WHERE id = 2").head().getString(0) === "retry")
  }

  test("conflict with an autocommit writer after the snapshot") {
    val e = seeded()
    val s1 = e.newSession()
    s1.sql("BEGIN")
    s1.sql("UPDATE t SET v = 'txn' WHERE id = 3") // pins snapshot + writes pk 3
    e.sql("DELETE FROM t WHERE id = 3") // direct write to the same pk
    intercept[QueryEngine.SerializationFailureException] { s1.sql("COMMIT") }
    assert(count(e.newSession()) === 2L, "the direct delete stands")
  }

  test("insert-insert conflict on the same new pk preserves uniqueness") {
    val e = seeded()
    val s1 = e.newSession()
    val s2 = e.newSession()
    s1.sql("BEGIN"); s2.sql("BEGIN")
    s1.sql("INSERT INTO t VALUES (7, 'one')") // pk probe passes: 7 is new
    s2.sql("INSERT INTO t VALUES (7, 'two')") // passes too — can't see s1's buffer
    s1.sql("COMMIT")
    intercept[QueryEngine.SerializationFailureException] { s2.sql("COMMIT") }
    val got = e.sql("SELECT v FROM t WHERE id = 7").collect().toSeq
    assert(got === Seq(Row("one")))
  }

  test("snapshot horizon bounds checkpoint choice, not own writes") {
    val e = seeded()
    val s1 = e.newSession()
    s1.sql("BEGIN")
    assert(count(s1) === 3L) // pins snapshot before the snapshot file below
    e.sql("INSERT INTO t VALUES (20, 'later')")
    e.snapshot("t") // checkpoint PAST s1's horizon
    s1.sql("INSERT INTO t VALUES (21, 'buffered')")
    // 3 original + own buffered row; the id=20 commit and the
    // checkpoint that contains it stay invisible
    assert(count(s1) === 4L)
    assert(count(s1, "id = 20") === 0L)
    assert(count(s1, "id = 21") === 1L)
    s1.sql("COMMIT") // pks disjoint — commits clean
    assert(count(e.newSession()) === 5L)
  }

  test("SNAPSHOT inside a transaction is rejected") {
    val e = seeded()
    val s1 = e.newSession()
    s1.sql("BEGIN")
    s1.sql("INSERT INTO t VALUES (30, 'buf')")
    // in the txn session the checkpoint would durably capture the
    // buffered row — rejected; from a session with no open txn it's fine
    intercept[IllegalStateException] { s1.sql("SNAPSHOT t") }
    s1.sql("ROLLBACK")
    e.sql("SNAPSHOT t")
  }

  test("engine.sql is the default session and interleaves with others") {
    val e = seeded()
    e.sql("BEGIN")
    e.sql("UPDATE t SET v = 'default' WHERE id = 1")
    val s2 = e.newSession()
    assert(count(s2) === 3L)
    assert(s2.sql("SELECT v FROM t WHERE id = 1").head().getString(0) === "a",
      "default session's buffer is invisible to a new session")
    e.sql("COMMIT")
    assert(s2.sql("SELECT v FROM t WHERE id = 1").head().getString(0) === "default")
  }
}
