package graft
import graft.exec.QueryEngine
import org.apache.spark.sql.SparkSession

/** Round-19 scale-audit drive (SCALE.md addendum; not part of the
  * driver contract): exercises, at the ScaleGen third-decade corpus,
  * the three at-100TB claims the r18 verdict flagged as
  * reasoning-only plus this round's refresh-term overlap —
  *
  *  1. engine-side exchange sizing (ShuffleSizing) with NO
  *     SPARK_GRAFT_SHUFFLE env: the corpus INSERT..SELECT and the
  *     refresh must size their own exchanges (the session default
  *     stays at the thread count, the third decade's fatal setting);
  *  2. the literalization byte gate: a corpus-scale DML batch must
  *     stay distributed (its staging write runs Spark jobs), while a
  *     3-row UPDATE on the same table rides the driver-literal path;
  *  3. AQE-on-cached sizing of the refresh's pinned frames, and the
  *     multi-touched refresh's concurrent per-term materialization,
  *     against bulk (past-the-inline-cap) churn on BOTH sides;
  *  4. correctness at scale: the incrementally-refreshed view must
  *     equal a from-scratch aggregation over current state.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<scaled corpus> runMain graft.ScaleAudit */
object ScaleAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-sf100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus) // engine must re-size
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val maxStageTasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          maxStageTasks.getAndUpdate(m => math.max(m, e.stageInfo.numTasks.toLong))
      })
    val e = QueryEngine.scratch(spark)
    e.attachExternal("li", s"$dir/lineitem.parquet")
    def timed(label: String)(f: => Unit): Unit = {
      val (j0, m0) = (jobs.get, maxStageTasks.getAndSet(0))
      val t0 = System.nanoTime()
      f
      println(f"[audit] $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
        f"j=${jobs.get - j0}%4d maxStageTasks=${maxStageTasks.get}%5d")
    }
    timed("DDL") {
      e.sql("CREATE TABLE fact (k BIGINT PRIMARY KEY, ok BIGINT, v BIGINT)")
      e.sql("CREATE TABLE dim (d BIGINT PRIMARY KEY, grp BIGINT)")
    }
    // corpus-scale batch: ~60 M rows — the literalization gate must
    // keep it distributed and ShuffleSizing must size its exchanges
    timed("INSERT corpus batch (~60M rows)") {
      e.sql("""INSERT INTO fact
              |SELECT l_orderkey * 10 + l_linenumber, MAX(l_orderkey) % 100000,
              |       SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
              |FROM li WHERE l_orderkey % 10 = 0
              |GROUP BY l_orderkey, l_linenumber""".stripMargin)
    }
    timed("INSERT dim (100k rows)") {
      e.sql("""INSERT INTO dim
              |SELECT DISTINCT l_orderkey % 100000, (l_orderkey % 100000) % 97
              |FROM li WHERE l_orderkey % 10 = 0""".stripMargin)
    }
    timed("CREATE MATERIALIZED VIEW (full aggregate)") {
      e.sql("""CREATE MATERIALIZED VIEW mv AS
              |SELECT grp, COUNT(*) AS n, SUM(v) AS sv
              |FROM fact JOIN dim ON fact.ok = dim.d
              |GROUP BY grp""".stripMargin)
    }
    // bulk churn on BOTH sides, far past the 256-key inline cap, so
    // the cascade goes distributed-semi and BOTH telescoping terms
    // materialize concurrently over real bytes
    timed("bulk UPDATE fact (~60k rows)") {
      e.sql("UPDATE fact SET v = v + 1 WHERE k % 10000 = 7")
    }
    timed("bulk UPDATE dim (~1k rows)") {
      e.sql("UPDATE dim SET grp = (grp + 1) % 97 WHERE d % 100 = 3")
    }
    timed("REFRESH INCREMENTALLY (2 touched sides)") {
      e.sql("REFRESH MATERIALIZED VIEW mv INCREMENTALLY")
    }
    // literal fast path still intact on the SAME corpus-scale table:
    // a 3-row batch must pay ~zero staging jobs (driver write).
    // Pick three keys that EXIST (the fixture's key space is sparse).
    val ks = e.sql("SELECT k FROM fact ORDER BY k LIMIT 3").collect()
      .map(_.getLong(0))
    timed(s"point UPDATE fact (3 rows: ${ks.mkString(",")})") {
      e.sql(s"UPDATE fact SET v = v + 1 WHERE k IN (${ks.mkString(",")})")
    }
    timed("REFRESH INCREMENTALLY (1 touched side, point)") {
      e.sql("REFRESH MATERIALIZED VIEW mv INCREMENTALLY")
    }
    timed("correctness: view == from-scratch aggregate") {
      val v = e.sql("SELECT grp, n, sv FROM mv").collect()
        .map(_.toString).sorted
      val f = e.sql("""SELECT grp, COUNT(*) AS n, SUM(v) AS sv
                      |FROM fact JOIN dim ON fact.ok = dim.d
                      |GROUP BY grp""".stripMargin).collect()
        .map(_.toString).sorted
      require(v.sameElements(f),
        s"view diverged: ${v.length} vs ${f.length} rows")
      println(s"[audit] view rows = ${v.length}, exact match")
    }
    e.close()
    spark.stop()
  }
}
