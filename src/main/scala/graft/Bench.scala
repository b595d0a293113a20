package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every registered query at the given scale
  * factor and prints one JSON line. A query failure is recorded as
  * `ok:false` (and listed under "failed") rather than silently timed —
  * a crash must never masquerade as a fast run. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one untimed pass of the flagship query absorbs session warmup
    // (codegen compiler, parquet footer cache, shuffle service) so the
    // first timed query measures itself, not JVM startup
    try SparkEntry.entry(spark).count()
    catch { case e: Throwable => System.err.println(s"[bench] warmup: ${e.getMessage}") }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // millisecond precision keeps the one-line record short enough for
    // the driver's stdout tail capture — full-precision doubles pushed
    // the first ~12 queries past the tail window in earlier rounds
    def sec(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + sec(v) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // the full per-query record also lands in a file: stdout tails can
    // truncate a long line, and a truncated record silently loses the
    // first queries' timings
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_results.json"))
    java.nio.file.Files.writeString(out, line + "\n")
    System.err.println(s"[bench] full per-query JSON written to ${out.toAbsolutePath}")
    spark.stop()
  }
}
