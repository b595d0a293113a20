package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.exec.QueryEngine

/** Temporary: trace-span profile of the multi-statement bench floors
  * (q_trigger_audit / q_fk_lifecycle / q_matview_inc shapes) at
  * sf0.1. Removed when the floor work concludes. */
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
          println(f"    ${s.durMs}%8.0f ms  ${s.name}%-12s ${s.detail.replaceAll("\\s+", " ").take(50)}")
        }
      }
    }

    def scenario(warm: Boolean): Unit = {
      // --- q_trigger_audit shape
      var e = QueryEngine.scratch(spark)
      e.attachExternal("customer", s"$sfDir/customer.parquet")
      e.sql("CREATE TABLE acct (k BIGINT PRIMARY KEY, bal DOUBLE, status STRING)")
      e.sql("CREATE TABLE audit (aid BIGINT PRIMARY KEY, op STRING, n BIGINT)")
      val nextAid = "(SELECT COALESCE(MAX(aid), 0) + 1 FROM audit)"
      e.sql(s"""CREATE TRIGGER trg_ins AFTER INSERT ON acct EXECUTE
               |INSERT INTO audit SELECT $nextAid, 'insert', COUNT(*) FROM new_rows""".stripMargin)
      e.sql(s"""CREATE TRIGGER trg_upd AFTER UPDATE ON acct WHEN (bal > 5000) EXECUTE
               |INSERT INTO audit SELECT $nextAid, 'update_vip', COUNT(*) FROM new_rows""".stripMargin)
      e.sql(s"""CREATE TRIGGER trg_del AFTER DELETE ON acct EXECUTE
               |INSERT INTO audit SELECT $nextAid, 'delete', COUNT(*) FROM old_rows""".stripMargin)
      e.sql("SET TRACE ON")
      val t0 = System.nanoTime()
      e.sql("""INSERT INTO acct
              |SELECT c_custkey, c_acctbal, 'new' FROM customer
              |WHERE c_custkey < 500""".stripMargin)
      e.sql("UPDATE acct SET status = 'vip' WHERE bal > 5000")
      e.sql("DELETE FROM acct WHERE k % 10 = 0")
      e.sql("SELECT aid, op, n FROM audit ORDER BY aid").count()
      if (warm) {
        println(f"TRIGGER_AUDIT total ${(System.nanoTime()-t0)/1e6}%8.0f ms")
        dump(e, "q_trigger_audit")
      }
      e.close()

      // --- q_fk_lifecycle shape
      e = QueryEngine.scratch(spark)
      e.attachExternal("nation_src", s"$sfDir/nation.parquet")
      e.attachExternal("customer_src", s"$sfDir/customer.parquet")
      e.sql("CREATE TABLE nat (nk BIGINT PRIMARY KEY, nname STRING)")
      e.sql("""CREATE TABLE cust (ck BIGINT PRIMARY KEY,
              |  nk BIGINT REFERENCES nat(nk))""".stripMargin)
      e.sql("SET TRACE ON")
      val t1 = System.nanoTime()
      e.sql("INSERT INTO nat SELECT n_nationkey, n_name FROM nation_src")
      e.sql("""INSERT INTO cust
              |SELECT c_custkey, c_nationkey FROM customer_src
              |WHERE c_custkey < 300""".stripMargin)
      try e.sql("DELETE FROM nat WHERE nk = 3")
      catch { case _: IllegalArgumentException => () }
      e.sql("DELETE FROM cust WHERE nk IN (3, 7)")
      e.sql("DELETE FROM nat WHERE nk = 7")
      e.sql("""SELECT n.nk, n.nname, COUNT(c.ck) AS n_cust
              |FROM nat n LEFT JOIN cust c ON c.nk = n.nk
              |GROUP BY n.nk, n.nname
              |ORDER BY n.nk""".stripMargin).count()
      if (warm) {
        println(f"FK_LIFECYCLE total ${(System.nanoTime()-t1)/1e6}%8.0f ms")
        dump(e, "q_fk_lifecycle")
      }
      e.close()
    }
    scenario(warm = false) // JIT/codegen warmup pass
    scenario(warm = true)
    spark.stop()
  }
}
