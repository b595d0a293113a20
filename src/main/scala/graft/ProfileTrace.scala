package graft

import org.apache.spark.sql.SparkSession
import graft.exec.QueryEngine

/** Temporary: trace-span profile of the multi-statement bench floors.
  * Removed when the floor work concludes. */
object ProfileTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def dump(e: QueryEngine, label: String): Unit = {
      println(s"==== $label ====")
      e.tracer.traces.reverse.foreach { t =>
        println(f"${t.totalMs}%8.0f ms  ${t.statement.replaceAll("\\s+", " ").take(70)}")
        t.spans.filter(_.parentId >= 0).foreach { s =>
          println(f"    ${s.durMs}%8.0f ms  ${s.name}%-14s ${s.detail.replaceAll("\\s+", " ").take(50)}")
        }
      }
    }

    def scenario(warm: Boolean): Unit = {
      val e = QueryEngine.scratch(spark)
      e.attachExternal("customer", s"$sfDir/customer.parquet")
      e.sql("CREATE TABLE acct (k BIGINT PRIMARY KEY, bal DOUBLE, status STRING)")
      e.sql("SET TRACE ON")
      val t0 = System.nanoTime()
      e.sql("""INSERT INTO acct
              |SELECT c_custkey, c_acctbal, 'new' FROM customer
              |WHERE c_custkey < 500""".stripMargin)
      e.sql("""CREATE MATERIALIZED VIEW inc_stats AS
              |SELECT status, COUNT(*) AS n, COUNT(bal) AS nb,
              |       SUM(CAST(bal AS DECIMAL(12,2))) AS total
              |FROM acct GROUP BY status""".stripMargin)
      e.sql("UPDATE acct SET status = 'vip' WHERE bal > 5000")
      e.sql("DELETE FROM acct WHERE k % 10 = 0")
      e.sql("INSERT INTO acct VALUES (9001, NULL, 'vip')")
      e.sql("REFRESH MATERIALIZED VIEW inc_stats INCREMENTALLY")
      e.sql("""SELECT status, n, nb, CAST(total AS DOUBLE) AS total_bal
              |FROM inc_stats ORDER BY status""".stripMargin).count()
      if (warm) {
        println(f"MATVIEW_INC total ${(System.nanoTime()-t0)/1e6}%8.0f ms")
        dump(e, "q_matview_inc")
      }
      e.close()
    }
    scenario(warm = false)
    scenario(warm = true)
    spark.stop()
  }
}
