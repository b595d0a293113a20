package graft.exec

import graft.TestSpark
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** BACKUP / RESTORE / VERIFY (backup.rs:78, 156, 250, 292): full and
  * incremental backups with a manifest commit point, chain-resolved
  * restore that wipes and re-materializes the base dir, and checksum
  * verification that catches corruption.
  */
class BackupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def engineWith(dir: String): QueryEngine = {
    val e = new QueryEngine(spark, dir)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY, v STRING)")
    e.sql("INSERT INTO t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    e
  }

  private def rows(e: QueryEngine): Seq[Row] =
    e.sql("SELECT k, v FROM t ORDER BY k").collect().toSeq

  test("full backup restores the backup-point state; later DML is undone") {
    val base = tmp("graft-bk-base-")
    val bdir = tmp("graft-bk-b1-") + "/b1"
    val e = engineWith(base)
    e.sql(s"BACKUP DATABASE TO '$bdir'")
    e.sql("UPDATE t SET v = 'X'")
    e.sql("DELETE FROM t WHERE k = 1")
    e.sql("INSERT INTO t VALUES (9, 'z')")
    assert(rows(e) === Seq(Row(2L, "X"), Row(3L, "X"), Row(9L, "z")))
    e.sql(s"RESTORE DATABASE FROM '$bdir'")
    assert(rows(e) === Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c")))
    // the restored engine keeps working: sequences continue uniquely
    e.sql("INSERT INTO t VALUES (4, 'd')")
    assert(rows(e) === Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c"), Row(4L, "d")))
    assert(e.sql("SELECT COUNT(*) AS n FROM t FOR SYSTEM_TIME ALL")
      .collect().head.getLong(0) === 4L)
    e.close()
  }

  test("incremental chain: restore either point; shared files not re-copied") {
    val base = tmp("graft-bk-base-")
    val root = tmp("graft-bk-chain-")
    val e = engineWith(base)
    val b1 = e.sql(s"BACKUP DATABASE TO '$root/full'").collect().head
    e.sql("INSERT INTO t VALUES (4, 'd')")
    val b2 = e.sql(
      s"BACKUP DATABASE TO '$root/incr' INCREMENTAL FROM '$root/full'")
      .collect().head
    // the incremental copied strictly fewer files than it recorded
    // (the unchanged log batches inherit from the parent)
    assert(b2.getLong(2) < b2.getLong(1) && b2.getLong(1) >= b1.getLong(1))
    e.sql("DELETE FROM t") // diverge
    e.sql(s"RESTORE DATABASE FROM '$root/incr'")
    assert(rows(e) ===
      Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c"), Row(4L, "d")))
    e.sql(s"RESTORE DATABASE FROM '$root/full'")
    assert(rows(e) === Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c")))
    e.close()
  }

  test("DROP TABLE between backups does not resurrect on restore") {
    val base = tmp("graft-bk-base-")
    val root = tmp("graft-bk-drop-")
    val e = engineWith(base)
    e.sql(s"BACKUP DATABASE TO '$root/full'")
    e.sql("DROP TABLE t")
    e.sql("CREATE TABLE u (k BIGINT PRIMARY KEY)")
    e.sql("INSERT INTO u VALUES (7)")
    e.sql(s"BACKUP DATABASE TO '$root/incr' INCREMENTAL FROM '$root/full'")
    e.sql(s"RESTORE DATABASE FROM '$root/incr'")
    // t is gone from the catalog AND its stale temp view dropped, so
    // the name no longer resolves anywhere
    intercept[org.apache.spark.sql.AnalysisException] { e.sql("SELECT * FROM t") }
    assert(e.sql("SELECT k FROM u").collect() === Array(Row(7L)))
    // and the full still restores t
    e.sql(s"RESTORE DATABASE FROM '$root/full'")
    assert(rows(e) === Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c")))
    e.close()
  }

  test("VERIFY passes intact backups and catches corruption") {
    val base = tmp("graft-bk-base-")
    val bdir = tmp("graft-bk-v-") + "/b"
    val e = engineWith(base)
    e.sql(s"BACKUP DATABASE TO '$bdir'")
    assert(e.sql(s"VERIFY BACKUP '$bdir'").collect().head.getString(2) === "ok")
    // flip one byte in a backed-up log file
    val f = java.nio.file.Files.walk(java.nio.file.Paths.get(bdir))
      .filter(p => p.getFileName.toString.startsWith("part-"))
      .findFirst().get()
    val bytes = java.nio.file.Files.readAllBytes(f)
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0xff).toByte
    java.nio.file.Files.write(f, bytes)
    // remove the Hadoop local-FS checksum sidecar so the read succeeds
    // and OUR manifest CRC32 is what catches the corruption
    java.nio.file.Files.deleteIfExists(
      f.getParent.resolve("." + f.getFileName.toString + ".crc"))
    val ex = intercept[IllegalStateException] { e.sql(s"VERIFY BACKUP '$bdir'") }
    assert(ex.getMessage.contains("checksum"))
    // restore refuses to materialize the corrupt file
    intercept[IllegalStateException] { e.sql(s"RESTORE DATABASE FROM '$bdir'") }
    e.close()
  }

  test("restore carries governance state: policies, grants, migrations, floors") {
    val base = tmp("graft-bk-base-")
    val bdir = tmp("graft-bk-gov-") + "/b"
    val e = engineWith(base)
    e.sql("ALTER TABLE t ENABLE ROW LEVEL SECURITY")
    e.sql("CREATE POLICY own ON t USING (v = current_user)")
    e.sql("GRANT SELECT ON t TO alice")
    e.sql("CREATE MIGRATION '1.0' UP INSERT INTO t VALUES (9, 'm')")
    e.sql("MIGRATE")
    e.sql(s"BACKUP DATABASE TO '$bdir'")
    e.sql("DROP POLICY own ON t")
    e.sql("REVOKE SELECT ON t FROM alice")
    e.sql(s"RESTORE DATABASE FROM '$bdir'")
    assert(e.sql("SHOW POLICIES").collect().map(_.getString(0)).toSeq === Seq("own"))
    assert(e.sql("SHOW GRANTS").collect().map(_.getString(2)).toSeq === Seq("alice"))
    assert(e.sql("SHOW MIGRATIONS").collect().map(r => (r.getString(0), r.getBoolean(1))).toSeq
      === Seq(("1.0", true)))
    // the restored RLS is live, not just listed
    val alice = e.newSession(); alice.setAuth("alice")
    assert(alice.sql("SELECT COUNT(*) AS n FROM t").collect().head.getLong(0) === 0L)
    e.close()
  }

  test("the distributed copy path produces the same verified backup") {
    val base = tmp("graft-bk-base-")
    val bdir = tmp("graft-bk-dist-") + "/b"
    val e = engineWith(base)
    e.sql("INSERT INTO t VALUES (4, 'd')")
    e.sql("UPDATE t SET v = 'x' WHERE k = 1") // several log files + meta
    val saved = Backup.DistributeThreshold
    try {
      Backup.DistributeThreshold = 2 // force the Spark-job copy path
      e.sql(s"BACKUP DATABASE TO '$bdir'")
    } finally Backup.DistributeThreshold = saved
    assert(e.sql(s"VERIFY BACKUP '$bdir'").collect().head.getString(2) === "ok")
    e.sql("DELETE FROM t")
    e.sql(s"RESTORE DATABASE FROM '$bdir'")
    assert(rows(e) ===
      Seq(Row(1L, "x"), Row(2L, "b"), Row(3L, "c"), Row(4L, "d")))
    e.close()
  }

  test("BACKUP refuses to overwrite an existing backup; RESTORE needs a manifest") {
    val base = tmp("graft-bk-base-")
    val bdir = tmp("graft-bk-x-") + "/b"
    val e = engineWith(base)
    e.sql(s"BACKUP DATABASE TO '$bdir'")
    intercept[IllegalArgumentException] { e.sql(s"BACKUP DATABASE TO '$bdir'") }
    intercept[IllegalArgumentException] {
      e.sql(s"RESTORE DATABASE FROM '${tmp("graft-bk-empty-")}'")
    }
    e.close()
  }

  test("SHOW BACKUPS catalogs a chain: paths, ancestry, seqs, copy counts") {
    val base = tmp("graft-bk-base-")
    val root = tmp("graft-bk-cat-")
    val e = engineWith(base) // 1 CREATE + 1 INSERT -> seq 3
    e.sql(s"BACKUP DATABASE TO '$root/full'")
    e.sql("INSERT INTO t VALUES (4, 'd')")
    e.sql(s"BACKUP DATABASE TO '$root/incr' INCREMENTAL FROM '$root/full'")
    val cat = e.sql(s"SHOW BACKUPS IN '$root'").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(cat.size === 2)
    val full = cat(s"$root/full"); val incr = cat(s"$root/incr")
    assert(full.getString(1) === "" && incr.getString(1) === s"$root/full")
    assert(!full.isNullAt(2) && !incr.isNullAt(2)) // created timestamps
    assert(full.getLong(3) === 3L && incr.getLong(3) === 4L) // seq marks
    assert(full.getInt(4) === 1) // one table recorded
    // the incremental physically copied fewer files than it recorded
    assert(incr.getLong(6) < incr.getLong(5))
    assert(full.getLong(7) > 0L) // bytes
    // a non-backup subdir is skipped, not fatal
    new java.io.File(s"$root/notabackup").mkdirs()
    assert(e.sql(s"SHOW BACKUPS IN '$root'").count() === 2L)
    e.close()
  }

  test("RESTORE AS OF @SEQ cuts the chain at the covering manifest") {
    val base = tmp("graft-bk-base-")
    val root = tmp("graft-bk-pitr-")
    val e = engineWith(base) // seq 3 after fixture
    e.sql(s"BACKUP DATABASE TO '$root/full'")
    e.sql("INSERT INTO t VALUES (4, 'd')") // seq 4
    e.sql(s"BACKUP DATABASE TO '$root/i1' INCREMENTAL FROM '$root/full'")
    e.sql("INSERT INTO t VALUES (5, 'e')") // seq 5
    e.sql(s"BACKUP DATABASE TO '$root/i2' INCREMENTAL FROM '$root/i1'")
    e.sql("DELETE FROM t") // diverge past the last backup
    // restore to a sequence the MIDDLE backup covers: chain head is
    // i2 (seq 5), AS OF 4 must land i1's state, and report i1's path
    val r = e.sql(s"RESTORE DATABASE FROM '$root/i2' AS OF @SEQ:4")
      .collect().head
    assert(r.getString(2) === s"$root/i1")
    assert(rows(e) === Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c"),
      Row(4L, "d")))
    // a sequence below every manifest's mark has no covering backup
    val err = intercept[IllegalArgumentException] {
      e.sql(s"RESTORE DATABASE FROM '$root/i2' AS OF @SEQ:1")
    }
    assert(err.getMessage.contains("covers sequence"))
    // and the failed PITR attempt changed nothing
    assert(rows(e) === Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c"),
      Row(4L, "d")))
    e.close()
  }

  test("PRUNE BACKUPS retains by count, chain-pins parents, dry-runs") {
    val base = tmp("graft-bk-base-")
    val root = tmp("graft-bk-prune-")
    val e = engineWith(base)
    def act(sql: String): Map[String, String] =
      e.sql(sql).collect()
        .map(r => (r.getString(0).split('/').last, r.getString(1))).toMap
    e.sql(s"BACKUP DATABASE TO '$root/b1'")
    Thread.sleep(5) // distinct created-ms so youngest-first is stable
    e.sql("INSERT INTO t VALUES (4, 'd')")
    e.sql(s"BACKUP DATABASE TO '$root/b2' INCREMENTAL FROM '$root/b1'")
    Thread.sleep(5)
    e.sql("INSERT INTO t VALUES (5, 'e')")
    e.sql(s"BACKUP DATABASE TO '$root/b3'") // independent full, youngest
    // DRY RUN deletes nothing and reports the would-be actions: b1/b2
    // are not in kept b3's chain, so both would go
    assert(act(s"PRUNE BACKUPS IN '$root' KEEP 1 DRY RUN") ===
      Map("b3" -> "kept", "b2" -> "would_delete", "b1" -> "would_delete"))
    assert(e.sql(s"SHOW BACKUPS IN '$root'").count() === 3L)
    // KEEP 2: b2 is kept, so its parent b1 must survive the rules —
    // the reference's blind retention would delete it and break b2
    assert(act(s"PRUNE BACKUPS IN '$root' KEEP 2") ===
      Map("b3" -> "kept", "b2" -> "kept", "b1" -> "kept_parent"))
    assert(e.sql(s"SHOW BACKUPS IN '$root'").count() === 3L)
    // the pinned chain stays restorable end to end
    e.sql("DELETE FROM t")
    e.sql(s"RESTORE DATABASE FROM '$root/b2'")
    assert(rows(e) === Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c"),
      Row(4L, "d")))
    // KEEP 1 for real: nothing pins b1/b2 anymore — both delete
    assert(act(s"PRUNE BACKUPS IN '$root' KEEP 1") ===
      Map("b3" -> "kept", "b2" -> "deleted", "b1" -> "deleted"))
    assert(e.sql(s"SHOW BACKUPS IN '$root'").count() === 1L)
    e.sql(s"RESTORE DATABASE FROM '$root/b3'")
    assert(rows(e) === Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c"),
      Row(4L, "d"), Row(5L, "e")))
    // a rule is required
    val err = intercept[IllegalArgumentException] {
      e.sql(s"PRUNE BACKUPS IN '$root'")
    }
    assert(err.getMessage.contains("retention rule"), err.getMessage)
    // KEEP 0 would delete every restore point — rejected (round 16)
    val err0 = intercept[IllegalArgumentException] {
      e.sql(s"PRUNE BACKUPS IN '$root' KEEP 0")
    }
    assert(err0.getMessage.contains("KEEP must be at least 1"),
      err0.getMessage)
    assert(e.sql(s"SHOW BACKUPS IN '$root'").count() === 1L)
    // the independent clauses parse in EITHER order (round 16)
    assert(act(s"PRUNE BACKUPS IN '$root' OLDER THAN 7 DAYS KEEP 1") ===
      Map("b3" -> "kept"))
    assert(act(s"PRUNE BACKUPS IN '$root' DRY RUN KEEP 1") ===
      Map("b3" -> "kept"))
    // a duplicated clause is a statement error, not a silent override
    val errDup = intercept[IllegalArgumentException] {
      e.sql(s"PRUNE BACKUPS IN '$root' KEEP 1 KEEP 2")
    }
    assert(errDup.getMessage.contains("at most once"), errDup.getMessage)
    e.close()
  }

  test("PRUNE pins the chain of a root-dir backup, under any dir spelling") {
    // the catalog dir ITSELF can be a backup (list() supports it) and
    // is force-kept; its incremental PARENT must be pinned like any
    // kept backup's — and a trailing-slash or oddly-spelled dir
    // argument must not unpin it (paths compare normalized)
    val base = tmp("graft-bk-base-")
    val root = tmp("graft-bk-rootbk-")
    val e = engineWith(base)
    e.sql(s"BACKUP DATABASE TO '$root/b1'")
    Thread.sleep(5)
    e.sql("INSERT INTO t VALUES (4, 'd')")
    e.sql(s"BACKUP DATABASE TO '$root' INCREMENTAL FROM '$root/b1'")
    Thread.sleep(5)
    e.sql("INSERT INTO t VALUES (5, 'e')")
    e.sql(s"BACKUP DATABASE TO '$root/b2'")
    // trailing slash on purpose; KEEP 1 keeps only b2 by the rules,
    // but the root is force-kept and b1 is its restore chain
    val acts = e.sql(s"PRUNE BACKUPS IN '$root/' KEEP 1").collect()
      .map(r => (r.getString(0).stripSuffix("/").split('/').last,
        r.getString(1))).toMap
    assert(acts("b2") === "kept" && acts("b1") === "kept_parent")
    assert(acts(root.split('/').last) === "kept")
    // the root backup stays fully restorable through its parent
    e.sql("DELETE FROM t")
    e.sql(s"RESTORE DATABASE FROM '$root'")
    assert(rows(e) === Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c"),
      Row(4L, "d")))
    e.close()
  }

  test("PRUNE pins a chain that re-enters the catalog via an outside parent") {
    // b2 (in the catalog) -> mid (OUTSIDE the catalog dir) -> b1 (in
    // the catalog): the pin walk must follow mid's on-disk manifest
    // and keep b1, or b2's restore chain silently breaks
    val base = tmp("graft-bk-base-")
    val cat = tmp("graft-bk-reenter-")
    val other = tmp("graft-bk-outside-")
    val e = engineWith(base)
    e.sql(s"BACKUP DATABASE TO '$cat/b1'")
    Thread.sleep(5)
    e.sql("INSERT INTO t VALUES (4, 'd')")
    e.sql(s"BACKUP DATABASE TO '$other/mid' INCREMENTAL FROM '$cat/b1'")
    Thread.sleep(5)
    e.sql("INSERT INTO t VALUES (5, 'e')")
    e.sql(s"BACKUP DATABASE TO '$cat/b2' INCREMENTAL FROM '$other/mid'")
    val acts = e.sql(s"PRUNE BACKUPS IN '$cat' KEEP 1").collect()
      .map(r => (r.getString(0).split('/').last, r.getString(1))).toMap
    assert(acts === Map("b2" -> "kept", "b1" -> "kept_parent"), acts)
    e.sql("DELETE FROM t")
    e.sql(s"RESTORE DATABASE FROM '$cat/b2'")
    assert(rows(e) === Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c"),
      Row(4L, "d"), Row(5L, "e")))
    e.close()
  }

  test("age-based retention skips undatable backups and pinned parents") {
    val base = tmp("graft-bk-base-")
    val root = tmp("graft-bk-age-")
    val e = engineWith(base)
    // synthetic created times through the API (SQL stamps wall-clock)
    Backup.create(spark, base, s"$root/old", None,
      Map("t" -> 3L), createdMs = 1_000L)
    Backup.create(spark, base, s"$root/young", Some(s"$root/old"),
      Map("t" -> 3L), createdMs = 2_000_000L)
    // old is past the cutoff but young's chain pins it
    assert(Backup.prune(spark, root, None, Some(1_500_000L),
        dryRun = false, nowMs = 3_000_000L).toMap
      .map { case (p, a) => p.split('/').last -> a } ===
      Map("young" -> "kept", "old" -> "kept_parent"))
    // KEEP composes as a FLOOR under the age rule: with every backup
    // past the cutoff, KEEP 1 still protects the youngest (and its
    // chain) — retention must never leave zero restore points
    assert(Backup.prune(spark, root, Some(1), Some(500_000L),
        dryRun = true, nowMs = 3_000_000L).toMap
      .map { case (p, a) => p.split('/').last -> a } ===
      Map("young" -> "kept", "old" -> "kept_parent"))
    // with young past the cutoff too, the whole chain ages out
    assert(Backup.prune(spark, root, None, Some(500_000L),
        dryRun = false, nowMs = 3_000_000L).toMap
      .map { case (p, a) => p.split('/').last -> a } ===
      Map("young" -> "deleted", "old" -> "deleted"))
    assert(Backup.list(spark, root).isEmpty)
    e.close()
  }
}
