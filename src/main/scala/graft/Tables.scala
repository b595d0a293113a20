package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table access (TESTDATA.md). One parquet per table under the
  * given scale-factor dir. Loads are plain `spark.read.parquet` so
  * Catalyst pushes filters/projections into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session confs every entry point (Verify, Bench, tests) must set at
    * build time. nanosAsLong: events.parquet carries TIMESTAMP(NANOS),
    * which Spark's vectorized reader rejects; read nanos as long and
    * floor to microseconds in `load`. Set once per session — setting it
    * inside `load` would mutate shared session state per call. */
  val sessionConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    // Round 18 (optimization): let AQE re-plan the partitioning of
    // CACHED plans. The engine pins delta/key frames per refresh
    // (persist) and those materialized with the STATIC session
    // shuffle-partition count — 32 near-empty cached partitions per
    // pinned frame at fixture scale, and every consumer then pays one
    // task per cached partition (span-profiled: the all-churned
    // 5-table refresh ran 2675 tasks; with AQE sizing cached
    // exchanges by bytes it runs ~180 — 15×). Scale-adaptive in both
    // directions: at 100 TB a pinned corpus-scale frame gets
    // byte-sized partitions (advisory size) instead of the session
    // constant, exactly the §2.2 "fewer, larger partitions" rule.
    // Values are unchanged — only cached-plan partitioning moves.
    // Round 19 adjudication: an interleaved A/B with this conf forced
    // off (q_matview_expr 2.51-3.12 s off vs 2.56-3.19 s on, join5 and
    // avg equal within noise) cleared it of the driver-record
    // q_matview_expr regression — that sample was environmental. The
    // conf stays: its task-count evidence (2675 -> 180 tasks on the
    // all-churned 5-table refresh) is unrefuted.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning" -> "true")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      // TIMESTAMP(NANOS) testdata reads as long under nanosAsLong:
      // nanos floored to micros with integer division — a double
      // division would lose precision at 1e18 nanos.
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // micros testdata reads natively as NTZ; normalize to session-tz
      // TIMESTAMP (UTC session) so downstream window/as-of logic sees
      // the same type either way
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** Load and register as a temp view (for spark.sql-based queries). */
  def view(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = load(spark, dir, name)
    df.createOrReplaceTempView(name)
    df
  }

  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(view(spark, dir, _))
}
