package graft.exec

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** VACUUM RETAIN (the reclamation half of the reference's segment
  * compaction, engine.rs:739-845): covered log files and superseded
  * snapshots are physically deleted, reads at or above the floor stay
  * byte-identical, reads below it raise, and the floor persists.
  */
class VacuumSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def logFiles(e: QueryEngine, table: String): Seq[String] = {
    val d = new java.io.File(s"${e.baseDir}/tables/$table/log")
    if (!d.exists) Nil
    else d.listFiles.toSeq.map(_.getName).filter(_.startsWith("part-"))
  }

  test("vacuum deletes covered files; reads above the floor are unchanged") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY, v STRING)")
    e.sql("INSERT INTO t VALUES (1, 'a'), (2, 'b')") // seq 1-2
    e.sql("UPDATE t SET v = 'x' WHERE k = 1") // seq 3
    e.sql("INSERT INTO t VALUES (3, 'c')") // seq 4
    val before = logFiles(e, "t").size
    assert(before >= 3) // a multi-row VALUES batch may span 2 part files
    val expectCurrent = e.sql("SELECT k, v FROM t ORDER BY k").collect().toSeq
    val expectAt3 = e.sql(
      "SELECT k, v FROM t FOR SYSTEM_TIME AS OF @SEQ:3 ORDER BY k")
      .collect().toSeq
    // no snapshot exists yet: VACUUM takes one at the retain point
    val r = e.sql("VACUUM t RETAIN @SEQ:3").collect().head
    assert(r.getString(0) === "vacuumed" && r.getLong(2) === 3L)
    // the first two batches (max seq 2 and 3) are covered and gone;
    // the third (seq 4) survives
    assert(logFiles(e, "t").size === 1)
    assert(e.sql("SELECT k, v FROM t ORDER BY k").collect().toSeq
      === expectCurrent)
    assert(e.sql("SELECT k, v FROM t FOR SYSTEM_TIME AS OF @SEQ:3 ORDER BY k")
      .collect().toSeq === expectAt3)
    // below the floor: physically gone, must raise
    intercept[IllegalStateException] {
      e.sql("SELECT * FROM t FOR SYSTEM_TIME AS OF @SEQ:2").collect()
    }
    intercept[IllegalStateException] {
      e.sql("SELECT * FROM t FOR SYSTEM_TIME BETWEEN 1 AND 4").collect()
    }
    // the floor's own EVENTS are vacuumed too (only its STATE survives,
    // via the snapshot) — event ranges must start above the floor
    intercept[IllegalStateException] {
      e.sql("SELECT * FROM t FOR SYSTEM_TIME BETWEEN 3 AND 4").collect()
    }
    assert(e.sql("SELECT COUNT(*) AS n FROM t FOR SYSTEM_TIME BETWEEN 4 AND 4")
      .collect().head.getLong(0) === 1L)
  }

  test("vacuum prefers an existing snapshot; older snapshots are reclaimed") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY)")
    e.sql("INSERT INTO t VALUES (1)") // seq 1
    e.sql("SNAPSHOT t") // snapshot at 1
    e.sql("INSERT INTO t VALUES (2)") // seq 2
    e.sql("SNAPSHOT t") // snapshot at 2
    e.sql("INSERT INTO t VALUES (3)") // seq 3
    // retain 2: floor = existing snapshot at 2; snapshot at 1 reclaimed
    e.sql("VACUUM t RETAIN @SEQ:2")
    val snaps = new java.io.File(s"${e.baseDir}/tables/t/snapshots")
      .listFiles.toSeq.map(_.getName).sorted
    assert(snaps === Seq("seq=2"))
    assert(e.sql("SELECT COUNT(*) AS n FROM t").collect() === Array(Row(3L)))
    assert(e.sql("SELECT COUNT(*) AS n FROM t FOR SYSTEM_TIME AS OF @SEQ:2")
      .collect() === Array(Row(2L)))
  }

  test("a snapshot taken AFTER a vacuum keeps the reclaimed rows") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY, v STRING)")
    e.sql("INSERT INTO t VALUES (1,'a'), (2,'b'), (3,'c')") // seq 1-3
    e.sql("SNAPSHOT t")
    e.sql("VACUUM t RETAIN @SEQ:3") // pre-floor log files physically gone
    e.sql("INSERT INTO t VALUES (4,'d')") // seq 4
    // the regression: a raw-log collapse here would checkpoint ONLY row
    // 4 (rows 1-3 live solely in the seq=3 snapshot), and reads prefer
    // the newest snapshot — durable loss of rows 1-3
    e.sql("SNAPSHOT t")
    assert(e.sql("SELECT k FROM t ORDER BY k").collect().map(_.getLong(0)).toSeq
      === Seq(1L, 2L, 3L, 4L))
    // and the new snapshot itself must carry the old rows: reclaim the
    // whole log behind it and re-read
    e.sql("VACUUM t RETAIN @SEQ:4")
    assert(e.sql("SELECT k, v FROM t ORDER BY k").collect().map(_.getLong(0)).toSeq
      === Seq(1L, 2L, 3L, 4L))
    // re-snapshotting at the SAME sequence is a no-op, not a
    // read-while-overwrite of the snapshot dir
    e.sql("SNAPSHOT t")
    assert(e.sql("SELECT COUNT(*) AS n FROM t").collect().head.getLong(0) === 4L)
  }

  test("the retention floor persists across reopen; DML continues") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vac-").toString
    val e = new QueryEngine(spark, dir)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY)")
    e.sql("INSERT INTO t VALUES (1), (2)") // seq 1-2
    e.sql("INSERT INTO t VALUES (3)") // seq 3
    e.sql("VACUUM t RETAIN @SEQ:2")
    e.close()
    val e2 = new QueryEngine(spark, dir)
    intercept[IllegalStateException] {
      e2.sql("SELECT * FROM t FOR SYSTEM_TIME AS OF @SEQ:1").collect()
    }
    e2.sql("INSERT INTO t VALUES (4)") // sequences continue at 4
    assert(e2.sql("SELECT COUNT(*) AS n FROM t").collect() === Array(Row(4L)))
    // ALL promises the FULL event history, and events at/below the
    // floor are physically gone — raise like AS OF and BETWEEN do
    // instead of silently returning a truncated feed
    intercept[IllegalStateException] {
      e2.sql("SELECT COUNT(*) AS n FROM t FOR SYSTEM_TIME ALL").collect()
    }
    // the surviving range stays readable through BETWEEN
    assert(e2.sql("SELECT COUNT(*) AS n FROM t FOR SYSTEM_TIME BETWEEN 3 AND 4")
      .collect().head.getLong(0) === 2L)
    e2.close()
  }

  test("SHOW STORAGE tracks what vacuum and snapshot actually hold") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY, v STRING)")
    e.sql("INSERT INTO t VALUES (1,'a'), (2,'b'), (3,'c')")
    val before = e.sql("SHOW STORAGE FOR t").collect().head
    assert(before.getString(0) === "t")
    assert(before.getLong(1) > 0 && before.getLong(2) > 0) // log files+bytes
    assert(before.getLong(5) === 0L) // no snapshots yet
    assert(before.getLong(8) === 3L) // last_sequence

    e.sql("SNAPSHOT t")
    e.sql("VACUUM t RETAIN @SEQ:3")
    val after = e.sql("SHOW STORAGE FOR t").collect().head
    assert(after.getLong(1) === 0L, "covered log files reclaimed")
    assert(after.getLong(3) > 0L && after.getLong(5) === 1L) // one snapshot serving
    assert(after.getLong(6) === 3L) // newest_snapshot_seq
    assert(after.getLong(7) === 3L) // retention_floor
    // every engine table appears in the unfiltered listing
    e.sql("CREATE TABLE u (k BIGINT PRIMARY KEY)")
    assert(e.sql("SHOW STORAGE").collect().map(_.getString(0)).toSet === Set("t", "u"))
    e.close()
  }
}
