package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Per-user running total emitted by the stateful operator below. */
final case class UserRunningCount(user_id: Long, n_events: Long)

/** Input row shape for runningCounts (event time drives the state TTL). */
final case class UserEvent(user_id: Long, ts: java.sql.Timestamp)

/** Streaming analytics over an event stream — the Structured Streaming
  * counterparts of the batch pipeline queries (Pipeline.qEventsHourly /
  * qEventsSessions). The reference has no streaming surface (SURVEY
  * §2.11); these are the engine-native stream shapes for the same
  * computations, built on watermarked windowed aggregation and
  * `mapGroupsWithState`.
  *
  * Scale notes: a watermarked tumbling window keeps state bounded —
  * Spark drops window state once the watermark passes the window end,
  * so state size is O(active windows × groups), not O(stream length).
  * The stateful running count keeps one Long per user; state store
  * partitioning follows the groupBy key, same shuffle shape as the
  * batch aggregation. */
object StreamWindows {

  /** Tumbling-hour counts and exact-decimal value sums with a
    * watermark — the streaming twin of qEventsHourly. In append output
    * mode a window emits exactly once, when the watermark passes its
    * end; rows later than `watermark` are dropped. */
  def hourlyCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Gap-based sessionization on a stream — the streaming twin of the
    * batch lag+cumsum sessionizer (Pipeline.qEventsSessions): events of
    * one user closer together than `gap` merge into one session window;
    * a session emits once, when the watermark passes its close. Native
    * `session_window` keeps the merge logic in Spark's state store with
    * watermark-bounded state. */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("first_event"), col("last_event"))

  /** Stream-stream attribution join: each impression joined to the
    * clicks of the same user that land within `within` AFTER it —
    * the canonical two-stream enrichment (impression→click,
    * request→response, send→ack) that a batch join cannot express
    * online. Both sides carry watermarks and the join condition bounds
    * the event-time distance, so Spark's state store evicts a row as
    * soon as the other stream's watermark passes its join horizon:
    * state is O(rows inside the time window), not O(stream length) —
    * the only stream-stream join shape that survives an unbounded
    * stream.
    *
    * `joinType` "inner" emits matches only; "leftOuter" additionally
    * emits (impression, NULL click) once the click-side watermark
    * proves no match can arrive — exactly the "unattributed
    * impressions" feed an ads/telemetry pipeline wants.
    *
    * Input column contract: impressions (imp_id, user_id, ts),
    * clicks (click_id, user_id, ts). */
  def attributionJoin(impressions: DataFrame, clicks: DataFrame,
      within: String = "30 minutes", watermark: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    val imp = impressions.withWatermark("ts", watermark).alias("imp")
    val clk = clicks.withWatermark("ts", watermark).alias("clk")
    imp.join(clk,
        expr(s"""imp.user_id = clk.user_id AND
                 clk.ts >= imp.ts AND
                 clk.ts <= imp.ts + INTERVAL $within"""),
        joinType)
      .select(col("imp.imp_id"), col("imp.user_id"),
        col("imp.ts").as("imp_ts"), col("clk.click_id"),
        (col("clk.ts").cast("long") - col("imp.ts").cast("long"))
          .as("latency_s"))
  }

  /** Per-user running event count via `flatMapGroupsWithState` — custom
    * keyed state beyond what windowed aggregation expresses. Emits the
    * updated total for each user seen in a micro-batch.
    *
    * State is TTL-bounded: a user idle longer than `ttl` of EVENT time
    * (watermark clock) has its counter evicted and emits nothing —
    * without this, the operator holds one Long per user EVER SEEN,
    * which at 100 TB of events is an unbounded state store. Event-time
    * timeout (not processing-time) keeps eviction deterministic w.r.t.
    * the data, consistent with the watermark semantics of the windowed
    * operators above — and a processing-time timeout makes the
    * micro-batch engine poll continuously even with no data. A user
    * reappearing after eviction restarts from zero, the standard trade
    * of a TTL'd running aggregate. */
  def runningCounts(events: DataFrame, ttl: String = "1 hour",
      watermark: String = "1 hour"): Dataset[UserRunningCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"))
      // null keys/timestamps (including strings the cast silently
      // nulls) would NPE in the state function — they carry no event
      // time to age by, so drop them here
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", watermark) // after the cast: a projection of a
      // watermarked column would shed the watermark tag the stateful
      // operator requires
      .as[UserEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, UserRunningCount](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (user, batchRows, state) =>
          if (state.hasTimedOut) {
            state.remove() // evict; nothing to emit for an idle user
            Iterator.empty
          } else {
            val rows = batchRows.toSeq
            val total = state.getOption.getOrElse(0L) + rows.size
            state.update(total)
            // evict once the watermark passes last-seen + ttl
            state.setTimeoutTimestamp(rows.map(_.ts.getTime).max, ttl)
            Iterator.single(UserRunningCount(user, total))
          }
      }
  }
}
