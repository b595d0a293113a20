package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}
import java.util.concurrent.atomic.AtomicInteger
import graft.exec.QueryEngine

/** Temporary floor profiler: per-statement wall time + job counts for
  * the multi-statement engine scenarios. Not part of the driver
  * contract; removed when the floor work lands. */
object ProfileFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val jobMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    @volatile var trace = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); starts.put(js.jobId, System.nanoTime())
        if (trace) {
          val names = js.stageInfos.map(_.name.takeWhile(_ != '\n').take(50)).mkString(" | ")
          println(s"[floor]     job ${js.jobId}: stages=${js.stageIds.size} [$names]")
        }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null) {
          val ms = (System.nanoTime() - s) / 1000000L
          jobMs.addAndGet(ms)
          if (trace) println(s"[floor]     job ${je.jobId} end ${ms}ms")
        }
      }
    })

    def scenario(warm: Boolean): Unit = {
      val e = QueryEngine.scratch(spark)
      e.attachExternal("customer", s"$sfDir/customer.parquet")
      def t(label: String)(body: => Any): Unit = {
        val j0 = jobs.get(); val m0 = jobMs.get()
        val t0 = System.nanoTime()
        try body catch { case _: IllegalArgumentException => () }
        Thread.sleep(80) // let async listener events drain
        val wall = (System.nanoTime() - t0) / 1e6
        if (warm)
          println(f"[floor] $label%-28s ${wall}%8.0f ms  jobs=${jobs.get - j0}%2d  jobms=${jobMs.get - m0}%5d")
      }
      t("CREATE")(e.sql(
        """CREATE TABLE acct (
          |  k BIGINT PRIMARY KEY,
          |  bal DOUBLE NOT NULL CHECK (bal >= 0),
          |  status STRING DEFAULT 'new',
          |  email STRING UNIQUE)""".stripMargin))
      t("INSERT..SELECT")(e.sql(
        """INSERT INTO acct (k, bal, email)
          |SELECT c_custkey, c_acctbal, 'u' || CAST(c_custkey AS STRING)
          |FROM customer
          |WHERE c_custkey < 300 AND c_acctbal >= 0""".stripMargin))
      t("INSERT fail notnull")(e.sql("INSERT INTO acct VALUES (900, NULL, 'x', 'e900')"))
      t("INSERT fail check")(e.sql("INSERT INTO acct VALUES (901, -5, 'x', 'e901')"))
      t("INSERT pass literal")(e.sql("INSERT INTO acct VALUES (950, 10, 'x', 'e950')"))
      t("INSERT fail unique")(e.sql("INSERT INTO acct (k, bal, email) VALUES (902, 10, 'z'), (903, 11, 'z')"))
      t("UPDATE fail check")(e.sql("UPDATE acct SET bal = -1"))
      t("UPDATE pass")(e.sql("UPDATE acct SET status = 'vip' WHERE bal > 5000"))
      t("final SELECT count")(e.sql(
        "SELECT k, CAST(bal AS DOUBLE) AS bal, status, email FROM acct ORDER BY k").count())
    }
    def fkScenario(warm: Boolean): Unit = {
      val e = QueryEngine.scratch(spark)
      e.attachExternal("nation_src", s"$sfDir/nation.parquet")
      e.attachExternal("customer_src", s"$sfDir/customer.parquet")
      def t(label: String)(body: => Any): Unit = {
        val j0 = jobs.get(); val m0 = jobMs.get()
        val t0 = System.nanoTime()
        try body catch { case _: IllegalArgumentException => () }
        Thread.sleep(80)
        val wall = (System.nanoTime() - t0) / 1e6
        if (warm)
          println(f"[fk] $label%-28s ${wall}%8.0f ms  jobs=${jobs.get - j0}%2d  jobms=${jobMs.get - m0}%5d")
      }
      t("CREATE nat")(e.sql("CREATE TABLE nat (nk BIGINT PRIMARY KEY, nname STRING)"))
      t("CREATE cust")(e.sql(
        "CREATE TABLE cust (ck BIGINT PRIMARY KEY, nk BIGINT REFERENCES nat(nk))"))
      t("INSERT nat")(e.sql("INSERT INTO nat SELECT n_nationkey, n_name FROM nation_src"))
      t("INSERT cust")(e.sql(
        """INSERT INTO cust
          |SELECT c_custkey, c_nationkey FROM customer_src
          |WHERE c_custkey < 300""".stripMargin))
      t("DELETE blocked")(e.sql("DELETE FROM nat WHERE nk = 3"))
      t("DELETE cust children")(e.sql("DELETE FROM cust WHERE nk IN (3, 7)"))
      t("DELETE nat 7")(e.sql("DELETE FROM nat WHERE nk = 7"))
      t("final SELECT")(e.sql(
        """SELECT n.nk, n.nname, COUNT(c.ck) AS n_cust
          |FROM nat n LEFT JOIN cust c ON c.nk = n.nk
          |GROUP BY n.nk, n.nname
          |ORDER BY n.nk""".stripMargin).count())
    }
    scenario(warm = false) // warmup: codegen + parquet footer caches
    println("[floor] ---- warm run ----")
    scenario(warm = true)
    fkScenario(warm = false)
    println("[fk] ---- warm run ----")
    fkScenario(warm = true)
    spark.stop()
  }
}
