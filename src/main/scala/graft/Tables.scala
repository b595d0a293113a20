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
    "spark.sql.session.timeZone" -> "UTC")

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
