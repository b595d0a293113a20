package graft.exec

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, max, min}
import org.scalatest.funsuite.AnyFunSuite

/** CHECK TABLE / REPAIR TABLE — the parquet-event-log analogue of the
  * reference's self-healing recovery (error_recovery.rs:395-505:
  * corruption detection, segment truncation with bounded reported
  * loss, rebuild). Corruption is injected by truncating real part
  * files mid-byte. */
class IntegritySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def rows(e: QueryEngine, q: String): Seq[Row] =
    e.sql(q).collect().toSeq

  /** Engine with 3 single-row INSERT statements (sequences 1..3, one
    * or more part files per statement). */
  private def seeded(): QueryEngine = {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY, v STRING)")
    e.sql("INSERT INTO t VALUES (1, 'a')")
    e.sql("INSERT INTO t VALUES (2, 'b')")
    e.sql("INSERT INTO t VALUES (3, 'c')")
    e
  }

  private def logFiles(e: QueryEngine): Seq[java.nio.file.Path] = {
    val dir = java.nio.file.Paths.get(e.baseDir, "tables", "t", "log")
    val it = java.nio.file.Files.list(dir).iterator()
    scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala.toSeq
      .filter(_.getFileName.toString.startsWith("part-"))
  }

  /** Truncate (mid-byte) every log file whose sequence range is within
    * [lo, hi]. */
  private def corruptSeqRange(e: QueryEngine, lo: Long, hi: Long): Int = {
    var n = 0
    for (f <- logFiles(e)) {
      val r = spark.read.parquet(f.toString)
        .agg(min(col("sequence")), max(col("sequence"))).head()
      if (r.getLong(0) >= lo && r.getLong(1) <= hi) {
        val bytes = java.nio.file.Files.readAllBytes(f)
        java.nio.file.Files.write(f, bytes.take(bytes.length / 2))
        n += 1
      }
    }
    n
  }

  test("CHECK on a clean table reports OK everywhere; FULL is consistent") {
    val e = seeded()
    e.sql("SNAPSHOT t")
    val c = e.sql("CHECK TABLE t FULL").collect()
      .map(r => (r.getString(0), r.getString(2)))
    assert(c.count(_._1 == "log") >= 1)
    assert(c.forall { case (comp, st) =>
      st == "OK" || (comp == "state" && st == "CONSISTENT") }, c.toSeq)
    assert(c.exists(_ == ("sequence", "OK")), c.toSeq)
    assert(c.exists(_ == ("state", "CONSISTENT")), c.toSeq)
  }

  test("CHECK flags a truncated log file and the sequence hole it leaves") {
    val e = seeded()
    assert(corruptSeqRange(e, 2L, 2L) >= 1)
    val c = e.sql("CHECK TABLE t").collect()
      .map(r => (r.getString(0), r.getString(2), r.getString(3)))
    assert(c.exists(r => r._1 == "log" && r._2 == "CORRUPT"), c.toSeq)
    val seq = c.find(_._1 == "sequence").get
    assert(seq._2 === "HOLES", c.toSeq)
    assert(seq._3.contains("missing=1") && seq._3.contains("max_missing=2"), seq)
  }

  test("REPAIR quarantines, raises the floor over the hole, and serves survivors") {
    val e = seeded()
    corruptSeqRange(e, 2L, 2L)
    val r = e.sql("REPAIR TABLE t").collect()
      .map(x => (x.getString(0), x.getString(2)))
    assert(r.exists(_._1 == "quarantine"), r.toSeq)
    assert(r.exists(x => x._1 == "floor" && x._2.contains("raised to 2")), r.toSeq)
    assert(r.exists(x => x._1 == "lost" && x._2.contains("1 event")), r.toSeq)
    assert(r.exists(_._1 == "checkpoint"), r.toSeq)
    // survivors serve; the lost row is gone; reads below the floor refuse
    assert(rows(e, "SELECT k FROM t ORDER BY k") === Seq(Row(1L), Row(3L)))
    intercept[IllegalStateException] {
      e.sql("SELECT k FROM t FOR SYSTEM_TIME AS OF @SEQ:1").collect()
    }
    // the corrupt file sits in quarantine for forensics
    val q = java.nio.file.Paths.get(e.baseDir, "tables", "t", "quarantine")
    assert(java.nio.file.Files.list(q).count() >= 1)
    // a fresh engine over the same dir serves the repaired state
    val dir = e.baseDir
    e.close()
    val e2 = new QueryEngine(spark, dir)
    assert(rows(e2, "SELECT k FROM t ORDER BY k") === Seq(Row(1L), Row(3L)))
    e2.close()
  }

  test("a checkpoint covering the hole preserves the full state: zero loss") {
    val e = seeded() // seq 1..3
    e.sql("SNAPSHOT t") // checkpoint at 3 covers everything below
    e.sql("INSERT INTO t VALUES (4, 'd')") // seq 4, readable
    corruptSeqRange(e, 2L, 2L)
    val r = e.sql("REPAIR TABLE t").collect()
      .map(x => (x.getString(0), x.getString(2)))
    assert(r.exists(x => x._1 == "floor" && x._2.contains("raised to 3")), r.toSeq)
    assert(r.exists(x => x._1 == "lost" && x._2.startsWith("0 rows")), r.toSeq)
    // nothing lost: the checkpoint carried row 2 through
    assert(rows(e, "SELECT k FROM t ORDER BY k")
      === Seq(Row(1L), Row(2L), Row(3L), Row(4L)))
  }

  test("an unreadable checkpoint is dropped and rebuilt from the intact log") {
    val e = seeded()
    e.sql("SNAPSHOT t")
    // corrupt the checkpoint's files, leave the log intact
    val snapDir = java.nio.file.Paths.get(e.baseDir, "tables", "t", "snapshots")
    val it = java.nio.file.Files.walk(snapDir).iterator()
    for (f <- scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
        if f.getFileName.toString.startsWith("part-")) {
      val bytes = java.nio.file.Files.readAllBytes(f)
      java.nio.file.Files.write(f, bytes.take(bytes.length / 2))
    }
    val c = e.sql("CHECK TABLE t").collect()
      .map(x => (x.getString(0), x.getString(2)))
    assert(c.exists(x => x._1 == "checkpoint" && x._2 == "CORRUPT"), c.toSeq)
    val r = e.sql("REPAIR TABLE t").collect().map(_.getString(0))
    assert(r.contains("checkpoint_dropped"), r.toSeq)
    assert(r.contains("checkpoint"), r.toSeq)
    // full state back, rebuilt checkpoint readable, no floor raised
    assert(rows(e, "SELECT k FROM t ORDER BY k")
      === Seq(Row(1L), Row(2L), Row(3L)))
    val c2 = e.sql("CHECK TABLE t FULL").collect()
      .map(x => (x.getString(0), x.getString(2)))
    assert(c2.forall(x => x._2 == "OK" || x._2 == "CONSISTENT"), c2.toSeq)
  }

  test("CHECK FULL after vacuum reports SKIPPED, not a false divergence") {
    val e = seeded()
    e.sql("SNAPSHOT t")
    e.sql("VACUUM t RETAIN @SEQ:3")
    val c = e.sql("CHECK TABLE t FULL").collect()
      .map(x => (x.getString(0), x.getString(2)))
    assert(c.find(_._1 == "state").exists(_._2 == "SKIPPED"), c.toSeq)
  }

  test("REPAIR is superuser-only; CHECK follows the SELECT privilege") {
    val e = seeded()
    e.sql("SET PRIVILEGES ON")
    val alice = e.newSession(); alice.setAuth("alice")
    intercept[SecurityException] { alice.sql("REPAIR TABLE t") }
    intercept[SecurityException] { alice.sql("CHECK TABLE t") }
    e.sql("GRANT SELECT ON t TO alice")
    alice.sql("CHECK TABLE t") // readable now
    intercept[SecurityException] { alice.sql("REPAIR TABLE t") }
  }
}
