package graft.exec

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Row-level security (row_level_security.rs:56-340): per-table ENABLE
  * switch, CREATE/DROP POLICY with FOR/TO/USING/WITH CHECK clauses,
  * session security contexts, permissive-OR / restrictive-AND
  * combination, default deny, and superuser bypass. Enforcement is
  * set-based: USING folds into the read/matching plans, WITH CHECK
  * joins the statement's single guard job.
  */
class RlsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** docs table with an owner column, 3 alice rows + 2 bob rows. */
  private def fresh(): QueryEngine = {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE docs (id BIGINT PRIMARY KEY, owner STRING, words BIGINT)")
    e.sql("""INSERT INTO docs VALUES (1, 'alice', 10), (2, 'alice', 20),
            |(3, 'alice', 900), (4, 'bob', 30), (5, 'bob', 800)""".stripMargin)
    e
  }

  test("RLS disabled: everyone sees everything; enabled: default deny") {
    val e = fresh()
    val alice = e.newSession()
    alice.setAuth("alice")
    assert(alice.sql("SELECT COUNT(*) AS n FROM docs").collect()
      === Array(Row(5L)))
    e.sql("ALTER TABLE docs ENABLE ROW LEVEL SECURITY")
    // no policy yet -> non-superuser sees nothing (default deny)
    assert(alice.sql("SELECT COUNT(*) AS n FROM docs").collect()
      === Array(Row(0L)))
    // superuser (engine default session) bypasses
    assert(e.sql("SELECT COUNT(*) AS n FROM docs").collect() === Array(Row(5L)))
    e.sql("ALTER TABLE docs DISABLE ROW LEVEL SECURITY")
    assert(alice.sql("SELECT COUNT(*) AS n FROM docs").collect()
      === Array(Row(5L)))
  }

  test("USING (owner = current_user) filters SELECT per session") {
    val e = fresh()
    e.sql("ALTER TABLE docs ENABLE ROW LEVEL SECURITY")
    e.sql("CREATE POLICY own ON docs FOR SELECT USING (owner = current_user)")
    val alice = e.newSession(); alice.setAuth("alice")
    val bob = e.newSession(); bob.setAuth("bob")
    assert(alice.sql("SELECT id FROM docs ORDER BY id").collect().toSeq
      === Seq(Row(1L), Row(2L), Row(3L)))
    assert(bob.sql("SELECT id FROM docs ORDER BY id").collect().toSeq
      === Seq(Row(4L), Row(5L)))
  }

  test("permissive policies OR; restrictive policies AND on top") {
    val e = fresh()
    e.sql("ALTER TABLE docs ENABLE ROW LEVEL SECURITY")
    e.sql("CREATE POLICY own ON docs FOR SELECT USING (owner = current_user)")
    e.sql("CREATE POLICY big ON docs FOR SELECT USING (words > 750)")
    val alice = e.newSession(); alice.setAuth("alice")
    // own rows OR big rows: 1,2,3 (own) + 5 (big)
    assert(alice.sql("SELECT id FROM docs ORDER BY id").collect().toSeq
      === Seq(Row(1L), Row(2L), Row(3L), Row(5L)))
    e.sql("CREATE POLICY cap ON docs AS RESTRICTIVE FOR SELECT USING (words < 850)")
    // restrictive AND: drops 3 (900) and 5 would stay (800 < 850)
    assert(alice.sql("SELECT id FROM docs ORDER BY id").collect().toSeq
      === Seq(Row(1L), Row(2L), Row(5L)))
  }

  test("TO role scoping: a policy for auditors doesn't apply to others") {
    val e = fresh()
    e.sql("ALTER TABLE docs ENABLE ROW LEVEL SECURITY")
    e.sql("CREATE POLICY audit_all ON docs FOR SELECT TO auditor USING (true)")
    val carol = e.newSession(); carol.setAuth("carol")
    assert(carol.sql("SELECT COUNT(*) AS n FROM docs").collect()
      === Array(Row(0L)))
    carol.setAuth("carol", roles = Set("auditor"))
    assert(carol.sql("SELECT COUNT(*) AS n FROM docs").collect()
      === Array(Row(5L)))
  }

  test("UPDATE/DELETE touch only USING-visible rows; invisible rows survive") {
    val e = fresh()
    e.sql("ALTER TABLE docs ENABLE ROW LEVEL SECURITY")
    e.sql("CREATE POLICY own ON docs USING (owner = current_user)")
    val alice = e.newSession(); alice.setAuth("alice")
    alice.sql("UPDATE docs SET words = words + 1")
    alice.sql("DELETE FROM docs WHERE words > 850") // only her id=3 (901)
    // superuser sees: alice rows bumped, bob rows untouched, id=3 gone
    assert(e.sql("SELECT id, words FROM docs ORDER BY id").collect().toSeq
      === Seq(Row(1L, 11L), Row(2L, 21L), Row(4L, 30L), Row(5L, 800L)))
  }

  test("WITH CHECK vetoes INSERT and UPDATE rows escaping the policy") {
    val e = fresh()
    e.sql("ALTER TABLE docs ENABLE ROW LEVEL SECURITY")
    e.sql("""CREATE POLICY own ON docs USING (owner = current_user)
            |WITH CHECK (owner = current_user)""".stripMargin)
    val alice = e.newSession(); alice.setAuth("alice")
    alice.sql("INSERT INTO docs VALUES (6, 'alice', 40)") // passes
    val exIns = intercept[IllegalArgumentException] {
      alice.sql("INSERT INTO docs VALUES (7, 'bob', 50)") // forging bob
    }
    assert(exIns.getMessage.contains("row-level security"))
    val exUpd = intercept[IllegalArgumentException] {
      alice.sql("UPDATE docs SET owner = 'bob' WHERE id = 6") // giving away
    }
    assert(exUpd.getMessage.contains("row-level security"))
    assert(e.sql("SELECT COUNT(*) AS n FROM docs").collect() === Array(Row(6L)))
    assert(e.sql("SELECT owner FROM docs WHERE id = 6").collect()
      === Array(Row("alice")))
  }

  test("SET ROLE / RESET ROLE switch the SQL session context") {
    val e = fresh()
    e.sql("ALTER TABLE docs ENABLE ROW LEVEL SECURITY")
    e.sql("CREATE POLICY own ON docs FOR SELECT USING (owner = current_user)")
    val s = e.newSession()
    s.sql("SET ROLE alice")
    assert(s.sql("SELECT COUNT(*) AS n FROM docs").collect() === Array(Row(3L)))
    s.sql("SET ROLE bob")
    assert(s.sql("SELECT COUNT(*) AS n FROM docs").collect() === Array(Row(2L)))
    s.sql("RESET ROLE")
    assert(s.sql("SELECT COUNT(*) AS n FROM docs").collect() === Array(Row(5L)))
  }

  test("policies apply through views; FOR SELECT doesn't govern DELETE") {
    val e = fresh()
    e.sql("ALTER TABLE docs ENABLE ROW LEVEL SECURITY")
    e.sql("CREATE POLICY own ON docs FOR SELECT USING (owner = current_user)")
    e.sql("CREATE VIEW heavy AS SELECT id, owner FROM docs WHERE words >= 20")
    val alice = e.newSession(); alice.setAuth("alice")
    assert(alice.sql("SELECT id FROM heavy ORDER BY id").collect().toSeq
      === Seq(Row(2L), Row(3L)))
    // no DELETE policy exists -> default deny: nothing is deletable
    alice.sql("DELETE FROM docs")
    assert(e.sql("SELECT COUNT(*) AS n FROM docs").collect() === Array(Row(5L)))
  }

  test("policies persist across engine reopen; DROP POLICY / SHOW POLICIES") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rls-").toString
    val e = new QueryEngine(spark, dir)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY, owner STRING)")
    e.sql("INSERT INTO t VALUES (1, 'alice'), (2, 'bob')")
    e.sql("ALTER TABLE t ENABLE ROW LEVEL SECURITY")
    e.sql("CREATE POLICY own ON t USING (owner = current_user)")
    e.close()
    val e2 = new QueryEngine(spark, dir)
    assert(e2.sql("SHOW POLICIES").collect().map(_.getString(0)).toSeq
      === Seq("own"))
    val alice = e2.newSession(); alice.setAuth("alice")
    assert(alice.sql("SELECT k FROM t").collect() === Array(Row(1L)))
    e2.sql("DROP POLICY own ON t")
    // enabled + no policy = default deny again
    assert(alice.sql("SELECT COUNT(*) AS n FROM t").collect()
      === Array(Row(0L)))
    intercept[IllegalArgumentException] { e2.sql("DROP POLICY own ON t") }
    e2.sql("DROP POLICY IF EXISTS own ON t") // tolerated
    e2.close()
  }

  test("RESET ROLE restores the session's BASE context — no escalation") {
    val e = fresh()
    e.sql("ALTER TABLE docs ENABLE ROW LEVEL SECURITY")
    e.sql("CREATE POLICY own ON docs FOR SELECT USING (owner = current_user)")
    val alice = e.newSession(); alice.setAuth("alice")
    // the base context is alice — RESET ROLE must NOT mint a superuser
    alice.sql("RESET ROLE")
    assert(alice.sql("SELECT COUNT(*) AS n FROM docs").collect()
      === Array(Row(3L)))
    // SET ROLE is gated to base membership: alice cannot become bob
    intercept[SecurityException] { alice.sql("SET ROLE bob") }
    // a held role can be assumed and dropped again
    val carol = e.newSession(); carol.setAuth("carol", roles = Set("auditor"))
    carol.sql("SET ROLE auditor")
    carol.sql("RESET ROLE")
    assert(carol.currentUser === "carol")
    // the superuser default session keeps the old round trip
    e.sql("SET ROLE alice")
    assert(e.sql("SELECT COUNT(*) AS n FROM docs").collect()
      === Array(Row(3L)))
    e.sql("RESET ROLE")
    assert(e.sql("SELECT COUNT(*) AS n FROM docs").collect()
      === Array(Row(5L)))
  }

  test("matview population is gated: an RLS-filtered session cannot persist a partial shared view") {
    val e = fresh()
    e.sql("ALTER TABLE docs ENABLE ROW LEVEL SECURITY")
    e.sql("CREATE POLICY own ON docs USING (owner = current_user)")
    e.sql("""CREATE MATERIALIZED VIEW mv AS
            |SELECT owner, COUNT(*) AS n FROM docs GROUP BY owner""".stripMargin)
    val alice = e.newSession(); alice.setAuth("alice")
    intercept[SecurityException] { alice.sql("REFRESH MATERIALIZED VIEW mv") }
    intercept[SecurityException] {
      alice.sql("CREATE MATERIALIZED VIEW mv2 AS SELECT COUNT(*) AS n FROM docs")
    }
    // the matview still holds the full (superuser-populated) rows
    e.sql("REFRESH MATERIALIZED VIEW mv")
    assert(e.sql("SELECT SUM(n) AS s FROM mv").collect() === Array(Row(5L)))
  }

  test("security machinery is superuser-only: RLS admin, audit switch, trigger DDL") {
    val e = fresh()
    e.sql("ALTER TABLE docs ENABLE ROW LEVEL SECURITY")
    e.sql("CREATE POLICY own ON docs USING (owner = current_user)")
    val alice = e.newSession(); alice.setAuth("alice")
    // the obvious escalations: switch RLS off, widen/drop the policy,
    // silence the audit trail, or plant a trigger that will execute
    // under OTHER sessions' authority
    intercept[SecurityException] {
      alice.sql("ALTER TABLE docs DISABLE ROW LEVEL SECURITY") }
    intercept[SecurityException] {
      alice.sql("CREATE POLICY wide ON docs USING (true)") }
    intercept[SecurityException] { alice.sql("DROP POLICY own ON docs") }
    intercept[SecurityException] { alice.sql("SET AUDIT OFF") }
    intercept[SecurityException] {
      alice.sql("""CREATE TRIGGER sneak AFTER INSERT ON docs EXECUTE
                  |UPDATE docs SET owner = 'alice'""".stripMargin) }
    // her view is still the filtered one
    assert(alice.sql("SELECT COUNT(*) AS n FROM docs").collect()
      === Array(Row(3L)))
    // and with the privilege gate on, backup/restore/drop are gated too
    e.sql("SET PRIVILEGES ON")
    e.sql("GRANT SELECT ON docs TO alice")
    intercept[SecurityException] {
      alice.sql("BACKUP DATABASE TO '/tmp/graft-deny-bk'") }
    intercept[SecurityException] {
      alice.sql("RESTORE DATABASE FROM '/tmp/graft-deny-bk'") }
    intercept[SecurityException] { alice.sql("DROP TABLE docs") }
  }

  test("COPY FROM enforces INSERT WITH CHECK like a plain INSERT") {
    val e = fresh()
    e.sql("ALTER TABLE docs ENABLE ROW LEVEL SECURITY")
    e.sql("""CREATE POLICY own ON docs USING (owner = current_user)
            |WITH CHECK (owner = current_user)""".stripMargin)
    val dir = java.nio.file.Files.createTempDirectory("graft-copy-rls-")
    val forged = dir.resolve("forged.jsonl")
    java.nio.file.Files.write(forged,
      """{"id": 100, "owner": "bob", "words": 1}""".getBytes("UTF-8"))
    val own = dir.resolve("own.jsonl")
    java.nio.file.Files.write(own,
      """{"id": 101, "owner": "alice", "words": 2}""".getBytes("UTF-8"))
    val alice = e.newSession(); alice.setAuth("alice")
    val ex = intercept[IllegalArgumentException] {
      alice.sql(s"COPY docs FROM '$forged'")
    }
    assert(ex.getMessage.contains("row-level security"))
    alice.sql(s"COPY docs FROM '$own'") // her own rows pass
    assert(e.sql("SELECT COUNT(*) AS n FROM docs").collect() === Array(Row(6L)))
  }
}
