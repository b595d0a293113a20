package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class StreamWindowsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def ts(h: Int, m: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("watermarked tumbling windows finalize once the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamWindows.hourlyCounts(
      mem.toDF.toDF("ts", "event_type", "value"), watermark = "1 hour")
    val q = agg.writeStream.format("memory").queryName("hourly")
      .outputMode("append").start()
    try {
      mem.addData((ts(0, 10), "click", 1.0), (ts(0, 40), "click", 2.0),
        (ts(1, 5), "view", 5.0))
      q.processAllAvailable()
      // watermark = 01:05 - 1h = 00:05 — no window end (01:00) passed yet
      assert(spark.table("hourly").count() === 0)
      mem.addData((ts(3, 0), "click", 1.0))
      q.processAllAvailable()
      // watermark = 02:00: hour-0 and hour-1 windows are final
      val out = spark.table("hourly")
        .select("hour_start", "event_type", "n", "total_value")
        .collect().toSet
      assert(out === Set(
        Row(ts(0), "click", 2L, 3.0),
        Row(ts(1), "view", 1L, 5.0)))
      // a late row behind the watermark is dropped, not re-opened
      mem.addData((ts(0, 55), "click", 9.0))
      mem.addData((ts(5, 0), "view", 1.0))
      q.processAllAvailable()
      val hour0 = spark.table("hourly").where("hour_start = timestamp'2024-01-01 00:00:00'")
        .collect().toSeq
      assert(hour0 === Seq(Row(ts(0), "click", 2L, 3.0)))
    } finally q.stop()
  }

  test("session windows merge gap-close events and emit after watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Long)]
    val agg = StreamWindows.sessions(
      mem.toDF.toDF("ts", "user_id", "event_id"),
      gap = "30 minutes", watermark = "1 hour")
    val q = agg.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then one 2h
      // later (a second session)
      mem.addData((ts(0, 0), 1L, 100L), (ts(0, 10), 1L, 101L), (ts(2, 0), 1L, 102L))
      q.processAllAvailable()
      mem.addData((ts(6, 0), 2L, 200L)) // watermark -> 05:00, all user-1 sessions close
      q.processAllAvailable()
      val out = spark.table("sessions")
        .select("user_id", "n_events", "first_event", "last_event")
        .collect().toSet
      assert(out === Set(Row(1L, 2L, 100L, 101L), Row(1L, 1L, 102L, 102L)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState keeps a running per-user count across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val counts = StreamWindows.runningCounts(mem.toDF.toDF("ts", "user_id"))
    val q = counts.writeStream.format("memory").queryName("running")
      .outputMode("update").start()
    try {
      mem.addData((ts(0), 1L), (ts(0, 5), 1L), (ts(0, 10), 1L), (ts(0, 10), 2L))
      q.processAllAvailable()
      mem.addData((ts(0, 20), 1L), (ts(0, 20), 2L), (ts(0, 25), 2L))
      q.processAllAvailable()
      val rows = spark.table("running").as[UserRunningCount].collect().toSet
      // batch 1 emits (1,3),(2,1); batch 2 emits the updated (1,4),(2,3)
      assert(rows === Set(UserRunningCount(1L, 3L), UserRunningCount(2L, 1L),
        UserRunningCount(1L, 4L), UserRunningCount(2L, 3L)))
    } finally q.stop()
  }

  test("running-count state is evicted after the event-time TTL") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val counts = StreamWindows.runningCounts(mem.toDF.toDF("ts", "user_id"),
      ttl = "30 minutes", watermark = "0 seconds")
    val q = counts.writeStream.format("memory").queryName("running_ttl")
      .outputMode("update").start()
    try {
      mem.addData((ts(0), 1L), (ts(0), 1L)) // user 1 -> 2; timeout at 00:30
      q.processAllAvailable()
      mem.addData((ts(2), 2L)) // advances the watermark to 02:00...
      q.processAllAvailable()
      mem.addData((ts(2, 1), 2L)) // ...and this batch fires user 1's timeout
      q.processAllAvailable()
      mem.addData((ts(3), 1L)) // user 1 returns AFTER eviction
      q.processAllAvailable()
      val emitted = spark.table("running_ttl").as[UserRunningCount]
        .collect().toSeq
      // the count restarted at 1 — state (1 -> 2) was dropped by the
      // TTL; without eviction this would emit (1, 3)
      assert(emitted.contains(UserRunningCount(1L, 2L)))
      assert(emitted.count(_ == UserRunningCount(1L, 1L)) === 1)
      assert(!emitted.contains(UserRunningCount(1L, 3L)))
    } finally q.stop()
  }

  test("stream-stream attribution join bounds state and emits outer rows after watermark") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val imps = MemoryStream[(Long, Long, Timestamp)]
    val clks = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamWindows.attributionJoin(
      imps.toDF.toDF("imp_id", "user_id", "ts"),
      clks.toDF.toDF("click_id", "user_id", "ts"),
      within = "30 minutes", watermark = "1 hour", joinType = "leftOuter")
    val q = joined.writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    try {
      // imp 1 clicked 10 min later; imp 2 "clicked" 2h later (outside
      // the window); imp 3 never clicked
      imps.addData((1L, 100L, ts(1, 0)), (2L, 200L, ts(1, 0)), (3L, 300L, ts(1, 5)))
      clks.addData((11L, 100L, ts(1, 10)), (22L, 200L, ts(3, 0)))
      q.processAllAvailable()
      val matched = spark.table("attr").where("click_id IS NOT NULL")
        .select("imp_id", "click_id", "latency_s").collect().toSet
      assert(matched === Set(Row(1L, 11L, 600L)))
      // outer rows for 2 and 3 require the click watermark to pass
      // their join horizon — advance both streams far ahead
      imps.addData((9L, 900L, ts(8, 0)))
      clks.addData((99L, 900L, ts(8, 1)))
      q.processAllAvailable()
      imps.addData((10L, 901L, ts(9, 0)))
      clks.addData((100L, 901L, ts(9, 1)))
      q.processAllAvailable()
      val unattributed = spark.table("attr").where("click_id IS NULL")
        .select("imp_id").collect().map(_.getLong(0)).toSet
      assert(unattributed === Set(2L, 3L))
    } finally q.stop()
  }
}
