package graft.operators

import graft.TestSpark
import graft.exec.QueryEngine
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OPTIMIZE ... ZORDER BY: content-preserving physical re-clustering.
  * The layout claim that matters at 100 TB — per-file min/max ranges on
  * the clustered columns narrow, so parquet footer stats can skip row
  * groups — is asserted directly against the written files.
  */
class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  /** Mean per-file (max-min) width of `c` over a written parquet dir. */
  private def meanFileRange(dir: String, c: String): Double = {
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg((max(col(c)) - min(col(c))).cast("double").as("w"))
    perFile.agg(avg("w")).collect().head.getDouble(0)
  }

  test("clustering preserves content and narrows per-file ranges on BOTH columns") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val plainDir = java.nio.file.Files.createTempDirectory("zorder-plain-").toString
    val zDir = java.nio.file.Files.createTempDirectory("zorder-z-").toString
    // a deliberately layout-hostile base: shuffled round-robin so every
    // file starts with full-width ranges on every column
    orders.repartition(16).write.mode("overwrite").parquet(plainDir)
    // 16 files = 4 Morton prefix bits = 2 range splits per dimension
    ZOrder.cluster(orders, Seq("o_orderkey", "o_custkey"), 16)
      .write.mode("overwrite").parquet(zDir)

    // content identical
    val a = spark.read.parquet(plainDir)
    val b = spark.read.parquet(zDir)
    assert(a.count() === b.count())
    assert(a.exceptAll(b).count() === 0L && b.exceptAll(a).count() === 0L)

    // layout: BOTH interleaved columns narrow vs the shuffled base (a
    // single-column sort could only serve one of them); theoretical
    // width is 1/4 each — assert the conservative 1/2
    val plainO = meanFileRange(plainDir, "o_orderkey")
    val zO = meanFileRange(zDir, "o_orderkey")
    val plainC = meanFileRange(plainDir, "o_custkey")
    val zC = meanFileRange(zDir, "o_custkey")
    assert(zO < plainO / 2,
      s"o_orderkey file range did not narrow: $zO vs $plainO")
    assert(zC < plainC / 2,
      s"o_custkey file range did not narrow: $zC vs $plainC")
  }

  test("single-column clustering is a plain range sort") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("zorder-one-").toString
    ZOrder.cluster(docs.repartition(8), Seq("doc_id"), 4)
      .write.mode("overwrite").parquet(out)
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .orderBy("lo").collect()
    // disjoint, ordered file ranges = range partitioning worked
    ranges.sliding(2).foreach {
      case Array(x, y) => assert(x.getLong(2) < y.getLong(1))
      case _ =>
    }
  }

  test("OPTIMIZE through the engine: versioned rewrite, same state, time travel intact") {
    val e = QueryEngine.scratch(spark)
    e.attachExternal("customer", s"$sfDir/customer.parquet")
    e.sql("CREATE TABLE acct (k BIGINT PRIMARY KEY, bal DOUBLE, nat BIGINT)")
    e.sql("INSERT INTO acct SELECT c_custkey, c_acctbal, c_nationkey FROM customer")
    e.sql("UPDATE acct SET bal = 0 WHERE k % 100 = 0")
    val before = e.sql("SELECT k, bal, nat FROM acct ORDER BY k").collect().toSeq

    val r = e.sql("OPTIMIZE acct ZORDER BY (nat, bal)").collect().head
    assert(r.getString(0) === "optimize")
    assert(e.sql("SELECT k, bal, nat FROM acct ORDER BY k").collect().toSeq === before)

    val snaps = new java.io.File(s"${e.baseDir}/tables/acct/snapshots")
    val names = snaps.listFiles.map(_.getName).toSeq.sorted
    assert(names.size === 1 && names.head.matches("""seq=\d+\.v1"""), names.toString)
    val seq = names.head.stripPrefix("seq=").stripSuffix(".v1").toLong
    assert(seq === r.getLong(2)) // the summary reports the checkpointed sequence

    // a second OPTIMIZE bumps the version and prunes the old dir
    e.sql("OPTIMIZE acct") // default: primary key
    assert(snaps.listFiles.map(_.getName).toSeq.sorted === Seq(s"seq=$seq.v2"))
    assert(e.sql("SELECT k, bal, nat FROM acct ORDER BY k").collect().toSeq === before)

    // time travel below the checkpoint still replays the log
    assert(e.sql(s"SELECT COUNT(*) AS n FROM acct FOR SYSTEM_TIME AS OF @SEQ:100")
      .collect().head.getLong(0) === 100L)

    // a half-written rewrite (version dir with no _SUCCESS) is ignored
    val fake = new java.io.File(snaps, s"seq=$seq.v9")
    assert(fake.mkdir())
    assert(e.sql("SELECT k, bal, nat FROM acct ORDER BY k").collect().toSeq === before)
    e.close()
  }

  test("OPTIMIZE guards: unknown column, in-transaction, attached") {
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY, v STRING)")
    e.sql("INSERT INTO t VALUES (1, 'a')")
    intercept[IllegalArgumentException] { e.sql("OPTIMIZE t ZORDER BY (nope)") }
    e.sql("BEGIN")
    intercept[IllegalStateException] { e.sql("OPTIMIZE t") }
    e.sql("ROLLBACK")
    e.close()
  }

  test("COPY TO with ZORDER clusters the export layout") {
    val e = QueryEngine.scratch(spark)
    e.attachExternal("orders", s"$sfDir/orders.parquet")
    val out = java.nio.file.Files.createTempDirectory("zorder-copy-").toString
    e.sql(s"""COPY (SELECT o_orderkey, o_custkey, o_totalprice FROM orders)
             |TO '$out/x' (FORMAT PARQUET, ZORDER (o_orderkey, o_custkey))"""
      .stripMargin.replace("\n", " "))
    val exported = spark.read.parquet(s"$out/x")
    assert(exported.count() === spark.read.parquet(s"$sfDir/orders.parquet").count())
    // clustered: per-file ranges narrow vs the full key span. An
    // unclustered export gives every file ~the full span; the curve
    // quadrants land well below it even with boundary-straddling files
    // (range-partition boundaries fall mid-quadrant), so 0.75 is the
    // robust side of the claim
    val span = exported.agg(max("o_orderkey") - min("o_orderkey"))
      .collect().head.getLong(0).toDouble
    assert(meanFileRange(s"$out/x", "o_orderkey") < span * 0.75)
    // unknown ZORDER column is rejected before writing
    val err = intercept[IllegalArgumentException] {
      e.sql(s"COPY (SELECT o_orderkey FROM orders) TO '$out/y' (FORMAT PARQUET, ZORDER (nope))")
    }
    assert(err.getMessage.contains("nope"))
    e.close()
  }

  test("clustering preserves any content: nulls, duplicates, strings, skew") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 2000).map { i =>
      val a: java.lang.Long = if (rnd.nextInt(10) == 0) null
        else Long.box(if (rnd.nextInt(4) == 0) 7L else rnd.nextInt(100).toLong)
      val sVal: String = if (rnd.nextInt(10) == 0) null
        else ("s" + rnd.nextInt(50))
      (i.toLong, a, sVal)
    }
    val df = rows.toDF("id", "a", "s")
    val out = ZOrder.cluster(df, Seq("a", "s"), 8)
    assert(out.count() === 2000L)
    assert(df.exceptAll(out).count() === 0L && out.exceptAll(df).count() === 0L)
  }
}
