package graft.streaming

import graft.TestSpark
import graft.exec.QueryEngine
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming ingestion (SURVEY §2.11 optional extension):
  * micro-batches append INSERT events with contiguous sequences, and
  * the full temporal surface works over streamed data. */
class StreamIngestSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("streamed micro-batches land as ordered insert events") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE clicks (id BIGINT PRIMARY KEY, page STRING, n BIGINT)")
    val mem = MemoryStream[(Long, String)]
    // column subset on purpose: `n` is absent from the stream → NULL
    val stream = mem.toDF.toDF("id", "page")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
    val q = StreamIngest.start(e, "clicks", stream, ckpt,
      trigger = Trigger.ProcessingTime(0L))
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()

    def rows(sql: String): Seq[Row] = e.sql(sql).collect().toSeq
    assert(rows("SELECT id, page, n FROM clicks ORDER BY id")
      === Seq(Row(1L, "a", null), Row(2L, "b", null), Row(3L, "c", null)))
    // contiguous sequences across micro-batches
    assert(rows("SELECT sequence, id FROM clicks FOR SYSTEM_TIME ALL ORDER BY sequence")
      === Seq(Row(1L, 1L), Row(2L, 2L), Row(3L, 3L)))
    // time travel to the first micro-batch boundary
    assert(rows("SELECT COUNT(*) AS c FROM clicks FOR SYSTEM_TIME AS OF @SEQ:2")
      === Seq(Row(2L)))
    // streamed events compose with regular DML on the same table
    e.sql("UPDATE clicks SET page = upper(page) WHERE id = 1")
    assert(rows("SELECT page FROM clicks WHERE id = 1") === Seq(Row("A")))
  }

  test("restart from the same checkpoint does not re-ingest processed batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE ev (id BIGINT PRIMARY KEY, v STRING)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
    val mem = MemoryStream[(Long, String)]
    val q1 = StreamIngest.start(e, "ev", mem.toDF.toDF("id", "v"), ckpt,
      trigger = Trigger.ProcessingTime(0L))
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q1.processAllAvailable()
    } finally q1.stop()
    // a new query over the SAME checkpoint resumes past batch 0
    val q2 = StreamIngest.start(e, "ev", mem.toDF.toDF("id", "v"), ckpt,
      trigger = Trigger.ProcessingTime(0L))
    try {
      mem.addData((3L, "c"))
      q2.processAllAvailable()
    } finally q2.stop()
    def rows(sql: String): Seq[Row] = e.sql(sql).collect().toSeq
    // ids 1 and 2 ingested exactly once; sequences stay contiguous
    assert(rows("SELECT id FROM ev ORDER BY id")
      === Seq(Row(1L), Row(2L), Row(3L)))
    assert(rows("SELECT COUNT(*) AS n FROM ev FOR SYSTEM_TIME ALL") === Seq(Row(3L)))
  }

  test("start rejects a batch frame and a missing table") {
    import spark.implicits._
    val e = QueryEngine.scratch(spark)
    e.sql("CREATE TABLE t2 (id BIGINT PRIMARY KEY)")
    val batch = Seq(1L).toDF("id")
    intercept[IllegalArgumentException] {
      StreamIngest.start(e, "t2", batch, "/tmp/unused")
    }
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    intercept[IllegalArgumentException] {
      StreamIngest.start(e, "nope", mem.toDF.toDF("id"), "/tmp/unused")
    }
  }
}
