package graft.exec

import graft.TestSpark
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.scalatest.funsuite.AnyFunSuite

/** CREATE INDEX made physical: log and snapshot parquet carry bloom
  * filters on indexed payload columns — the point-lookup structure the
  * reference's B-tree secondary indexes provide (index.rs:9-36),
  * re-expressed as the lakehouse row-group-skipping form.
  */
class BloomIndexSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Bloom-filter presence per column path in the first row group. */
  private def bloomCols(file: java.io.File): Map[String, Boolean] = {
    val in = HadoopInputFile.fromPath(new Path(file.toURI),
      spark.sparkContext.hadoopConfiguration)
    val r = ParquetFileReader.open(in)
    try {
      val rg = r.getFooter.getBlocks.get(0)
      import scala.jdk.CollectionConverters._
      rg.getColumns.asScala
        .map(c => c.getPath.toDotString -> (c.getBloomFilterOffset >= 0)).toMap
    } finally r.close()
  }

  private def parts(dir: String): Seq[java.io.File] = {
    val d = new java.io.File(dir)
    if (!d.exists) Nil
    else (d.listFiles.toSeq.filter(_.isDirectory).flatMap(_.listFiles) ++
      d.listFiles.toSeq).filter(f => f.isFile && f.getName.startsWith("part-"))
  }

  test("indexed columns get bloom filters in log and snapshot files; others do not") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY, v STRING, w STRING)")
    e.sql("CREATE INDEX idx_v ON t (v)")
    e.sql("INSERT INTO t SELECT id, CONCAT('v', id), CONCAT('w', id) FROM range(500)")
    e.sql("SNAPSHOT t")
    e.sql("OPTIMIZE t") // versioned rewrite inherits the blooms too

    val logParts = parts(s"${e.baseDir}/tables/t/log")
    val snapParts = parts(s"${e.baseDir}/tables/t/snapshots")
    assert(logParts.nonEmpty && snapParts.nonEmpty)
    for (f <- logParts ++ snapParts) {
      val blooms = bloomCols(f)
      assert(blooms.getOrElse("payload.v", false), s"no bloom on payload.v in $f")
      assert(!blooms.getOrElse("payload.w", true), s"unexpected bloom on payload.w in $f")
    }

    // the indexed column still answers point lookups correctly through
    // both the state collapse and the event feed
    assert(e.sql("SELECT k FROM t WHERE v = 'v123'")
      .collect().map(_.getLong(0)).toSeq === Seq(123L))
    assert(e.sql("SELECT COUNT(*) AS n FROM t FOR SYSTEM_TIME ALL WHERE v = 'v123'")
      .collect().head.getLong(0) === 1L)

    // DROP INDEX stops stamping blooms on subsequent writes
    e.sql("DROP INDEX idx_v")
    e.sql("INSERT INTO t VALUES (9001, 'late', 'late')")
    val newest = parts(s"${e.baseDir}/tables/t/log").maxBy(_.lastModified)
    assert(!bloomCols(newest).getOrElse("payload.v", true),
      "bloom still stamped after DROP INDEX")
    e.close()
  }

  test("composite index stamps blooms on every listed column and hints OPTIMIZE") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY, a STRING, b STRING, c STRING)")
    e.sql("CREATE INDEX ic ON t (a, b)")
    // high-cardinality values: parquet drops the bloom when a chunk
    // stays fully dictionary-encoded (the dictionary already answers
    // point probes exactly), so low-cardinality columns would show no
    // bloom regardless of the index
    e.sql("""INSERT INTO t
            |SELECT id, CONCAT('a', id), CONCAT('b', id),
            |       CONCAT('c', id) FROM range(500)""".stripMargin)
    e.sql("SNAPSHOT t")
    // every listed column carries a bloom; the unlisted one does not —
    // equality probes on EITHER column skip row groups independently
    // (index_strategies.rs composite strategies, lakehouse form)
    for (f <- parts(s"${e.baseDir}/tables/t/log") ++
         parts(s"${e.baseDir}/tables/t/snapshots")) {
      val blooms = bloomCols(f)
      assert(blooms.getOrElse("payload.a", false), s"no bloom on payload.a in $f")
      assert(blooms.getOrElse("payload.b", false), s"no bloom on payload.b in $f")
      assert(!blooms.getOrElse("payload.c", true), s"unexpected bloom on payload.c in $f")
    }
    // point probes on either column answer through the collapse
    assert(e.sql("SELECT COUNT(*) AS n FROM t WHERE a = 'a3'")
      .collect().head.getLong(0) === 1L)
    assert(e.sql("SELECT COUNT(*) AS n FROM t WHERE b = 'b7'")
      .collect().head.getLong(0) === 1L)
    // SHOW INDEXES round-trips the composite column list
    assert(e.sql("SHOW INDEXES").collect().map(_.toString).toSet
      === Set("[ic,t,a,b]"))
    // the composite declaration is the bare-OPTIMIZE Z-order hint:
    // the rewrite clusters by (a, b) and rows stay intact
    e.sql("OPTIMIZE t")
    assert(e.sql("SELECT COUNT(*) AS n FROM t").collect().head.getLong(0) === 500L)
    assert(e.sql("SELECT c FROM t WHERE a = 'a3' AND b = 'b3'")
      .collect().map(_.getString(0)).toSeq === Seq("c3"))
    // an unknown column in the composite is rejected at CREATE
    intercept[IllegalArgumentException] {
      e.sql("CREATE INDEX bad ON t (a, nope)")
    }
    // persistence: the composite survives reopen
    val base = e.baseDir
    e.close()
    val e2 = new QueryEngine(spark, base)
    assert(e2.sql("SHOW INDEXES").collect().map(_.toString).toSet
      === Set("[ic,t,a,b]"))
    e2.close()
  }

  test("driver-staged literal inserts stamp blooms like the job path") {
    // VALUES batches stage with the driver-side parquet write (round
    // 15) whose bloom options are parsed by hand — a literal INSERT
    // into an indexed table must still stamp the filter, and the file
    // must read back identically. High-cardinality strings: parquet
    // drops blooms on fully dictionary-encoded chunks.
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY, v STRING, w STRING)")
    e.sql("CREATE INDEX iv ON t (v)")
    val rows = (1 to 300).map(i => s"($i, 'val$i', 'w$i')").mkString(", ")
    e.sql(s"INSERT INTO t VALUES $rows")
    val logParts = parts(s"${e.baseDir}/tables/t/log")
    assert(logParts.nonEmpty)
    for (f <- logParts) {
      val blooms = bloomCols(f)
      assert(blooms.getOrElse("payload.v", false), s"no bloom on payload.v in $f")
      assert(!blooms.getOrElse("payload.w", true), s"unexpected bloom on payload.w in $f")
    }
    assert(e.sql("SELECT k FROM t WHERE v = 'val123'")
      .collect().map(_.getLong(0)).toSeq === Seq(123L))
    assert(e.sql("SELECT COUNT(*) AS n FROM t").collect().head.getLong(0) === 300L)
    e.close()
  }

  test("SHOW INDEXES lists the registry; DROP INDEX removes the row") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY, v STRING)")
    e.sql("CREATE INDEX i1 ON t (v)")
    e.sql("CREATE INDEX i2 ON t (k)")
    assert(e.sql("SHOW INDEXES").collect().map(_.toString).toSet
      === Set("[i1,t,v]", "[i2,t,k]"))
    e.sql("DROP INDEX i1")
    assert(e.sql("SHOW INDEXES").collect().map(_.toString).toSet === Set("[i2,t,k]"))
    intercept[IllegalArgumentException] { e.sql("DROP INDEX nope") }
    e.sql("DROP INDEX IF EXISTS nope") // no raise
    e.close()
  }
}
