package graft.queries

import graft.Tables
import graft.operators.RecursiveCTE
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.H._

/** Window functions (SURVEY §2.5), CTEs + recursive CTEs and subqueries
  * (§2.8). Window frames follow the SQL standard — the reference parses
  * frame text but discards it ([REF-BUG] sql_bridge.rs:6448-6452) and
  * runs RANGE positionally like ROWS (window.rs:576-601); we do not
  * replicate either.
  */
object Analytic {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Runs the same ANSI SQL text through spark.sql and the DuckDB
    * oracle — logic identity by construction. */
  private def sharedSql(name: String, tables: Seq[String], sql: String): Q =
    Q(name, sql) { (s, dir) =>
      tables.foreach(Tables.view(s, dir, _))
      s.sql(sql)
    }

  // -------------------------------------------------------------- windows

  /** ROW_NUMBER / RANK / DENSE_RANK — window.rs:322-364. row_number
    * gets a total order (ties broken by key) so results are
    * deterministic across engines; rank/dense_rank run on the value
    * alone so ties are exercised. */
  val qWinRank = Q(
    "q_win_rank",
    """SELECT c_mktsegment, c_custkey, CAST(c_acctbal AS DOUBLE) AS bal,
      |  ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn,
      |  RANK()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS rnk,
      |  DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS drnk
      |FROM customer
      |QUALIFY rn <= 5
      |ORDER BY c_mktsegment, rn""".stripMargin) { (s, dir) =>
    val wTotal = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val wVal = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc)
    t(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_custkey"),
        col("c_acctbal").cast("double").as("bal"),
        row_number().over(wTotal).as("rn"),
        rank().over(wVal).as("rnk"),
        dense_rank().over(wVal).as("drnk"))
      .where(col("rn") <= 5)
      .orderBy("c_mktsegment", "rn")
  }

  /** Running SUM (ROWS UNBOUNDED PRECEDING) and 3-row moving average
    * with explicit frames — window.rs:482-530 / 576-601. The moving
    * average is sum/count over the same frame (avg(DECIMAL) result
    * types differ between engines). */
  val qWinFrame = Q(
    "q_win_frame",
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |       / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov3
      |FROM orders
      |WHERE o_custkey <= 50
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wMov = w.rowsBetween(-2, Window.currentRow)
    t(s, dir, "orders")
      .where(col("o_custkey") <= 50)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(dec2(col("o_totalprice"))).over(wRun).cast("double").as("run_sum"),
        (sum(dec2(col("o_totalprice"))).over(wMov).cast("double") /
          count(lit(1)).over(wMov)).cast("double").as("mov3"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** LAG / LEAD with offsets and exact delta arithmetic —
    * window.rs:452-480. */
  val qWinLagLead = Q(
    "q_win_lag_lead",
    """SELECT o_custkey, o_orderkey,
      |  CAST(o_totalprice AS DOUBLE) AS price,
      |  CAST(LAG(o_totalprice, 1)  OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS DOUBLE) AS prev_price,
      |  CAST(LEAD(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS DOUBLE) AS next_price,
      |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) - CAST(LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS DECIMAL(12,2)) AS DOUBLE) AS delta
      |FROM orders
      |WHERE o_custkey <= 30
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    t(s, dir, "orders")
      .where(col("o_custkey") <= 30)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_totalprice").cast("double").as("price"),
        lag(col("o_totalprice"), 1).over(w).cast("double").as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).cast("double").as("next_price"),
        (dec2(col("o_totalprice")) - dec2(lag(col("o_totalprice"), 1).over(w)))
          .cast("double").as("delta"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** NTILE / PERCENT_RANK / CUME_DIST — window.rs:366-407. The ratio
    * results are exact IEEE divisions of small integers, so they match
    * the oracle bit-for-bit. */
  val qWinNtile = Q(
    "q_win_ntile",
    """SELECT s_suppkey,
      |  NTILE(4)       OVER (ORDER BY s_acctbal DESC, s_suppkey) AS tile,
      |  PERCENT_RANK() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS pr,
      |  CUME_DIST()    OVER (ORDER BY s_acctbal DESC, s_suppkey) AS cd
      |FROM supplier
      |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    val w = Window.orderBy(col("s_acctbal").desc, col("s_suppkey"))
    t(s, dir, "supplier")
      .select(col("s_suppkey"),
        ntile(4).over(w).as("tile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy("s_suppkey")
  }

  /** FIRST_VALUE / LAST_VALUE / NTH_VALUE over the full-partition frame
    * — standard semantics, not the reference's whole-partition-always
    * ([REF-BUG] window.rs:409-450). */
  val qWinFirstLast = Q(
    "q_win_first_last",
    """SELECT c_nationkey, c_custkey,
      |  FIRST_VALUE(c_custkey) OVER (PARTITION BY c_nationkey ORDER BY c_custkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_k,
      |  LAST_VALUE(c_custkey)  OVER (PARTITION BY c_nationkey ORDER BY c_custkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_k,
      |  NTH_VALUE(c_custkey, 2) OVER (PARTITION BY c_nationkey ORDER BY c_custkey ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_k
      |FROM customer
      |WHERE c_custkey <= 200
      |ORDER BY c_nationkey, c_custkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "customer")
      .where(col("c_custkey") <= 200)
      .select(col("c_nationkey"), col("c_custkey"),
        first(col("c_custkey")).over(w).as("first_k"),
        last(col("c_custkey")).over(w).as("last_k"),
        nth_value(col("c_custkey"), 2).over(w).as("second_k"))
      .orderBy("c_nationkey", "c_custkey")
  }

  /** RANGE frame over an integer ordering key — standard RANGE
    * semantics (peers by value distance), which the reference executes
    * positionally ([REF-BUG] window.rs:576-601). */
  val qWinRange = Q(
    "q_win_range",
    """SELECT n_regionkey, n_nationkey,
      |  COUNT(*) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS near_cnt,
      |  CAST(SUM(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS near_sum
      |FROM nation
      |ORDER BY n_regionkey, n_nationkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
      .rangeBetween(-6, Window.currentRow)
    t(s, dir, "nation")
      .select(col("n_regionkey"), col("n_nationkey"),
        count(lit(1)).over(w).as("near_cnt"),
        sum(col("n_nationkey")).over(w).cast("long").as("near_sum"))
      .orderBy("n_regionkey", "n_nationkey")
  }

  // -------------------------------------------------- CTEs & subqueries

  /** Chained non-recursive CTEs — sql_bridge.rs:759-783. Shared SQL
    * text through spark.sql and the oracle. */
  val qCte = sharedSql(
    "q_cte", Seq("customer", "orders"),
    """WITH seg AS (
      |  SELECT c_mktsegment AS seg, COUNT(*) AS n_cust
      |  FROM customer GROUP BY c_mktsegment),
      |spend AS (
      |  SELECT c_mktsegment AS seg,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |  FROM customer JOIN orders ON o_custkey = c_custkey
      |  GROUP BY c_mktsegment)
      |SELECT seg.seg AS seg, seg.n_cust AS n_cust, spend.total AS total,
      |       CAST(spend.total / seg.n_cust AS DOUBLE) AS per_cust
      |FROM seg JOIN spend ON seg.seg = spend.seg
      |ORDER BY seg""".stripMargin)

  /** WITH RECURSIVE (UNION ALL) — per-customer order chains walked by
    * the semi-naive DataFrame fixpoint (RecursiveCTE), mirroring
    * execute_recursive_cte (sql_bridge.rs:785-904). */
  val qCteRecursive = Q(
    "q_cte_recursive",
    """WITH RECURSIVE edges AS (
      |  SELECT o_custkey AS ck, o_orderkey AS src,
      |         LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS dst
      |  FROM orders WHERE o_custkey <= 100),
      |roots AS (
      |  SELECT o_custkey AS ck, MIN(o_orderkey) AS ok
      |  FROM orders WHERE o_custkey <= 100 GROUP BY o_custkey),
      |chain AS (
      |  SELECT ck, ok, 1 AS depth FROM roots
      |  UNION ALL
      |  SELECT e.ck, e.dst AS ok, c.depth + 1 AS depth
      |  FROM chain c JOIN edges e ON e.ck = c.ck AND e.src = c.ok
      |  WHERE e.dst IS NOT NULL)
      |SELECT ck, ok, depth FROM chain ORDER BY ck, depth""".stripMargin) { (s, dir) =>
    val o = t(s, dir, "orders").where(col("o_custkey") <= 100)
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    val edges = o.select(col("o_custkey").as("eck"), col("o_orderkey").as("src"),
      lead(col("o_orderkey"), 1).over(w).as("dst"))
      .where(col("dst").isNotNull)
      .localCheckpoint() // computed once; reused every iteration
    val anchor = o.groupBy(col("o_custkey").as("ck"))
      .agg(min(col("o_orderkey")).as("ok"))
      .withColumn("depth", lit(1))
    RecursiveCTE.run(anchor, frontier =>
      frontier.join(edges,
          frontier("ck") === edges("eck") && frontier("ok") === edges("src"))
        .select(col("ck"), col("dst").as("ok"), (col("depth") + 1).as("depth")),
      distinct = false)
      .orderBy("ck", "depth")
  }

  /** Uncorrelated scalar subquery as filter + projection —
    * sql_bridge.rs:5104-5163. Exact-decimal average keeps the threshold
    * bit-identical across engines. */
  val qScalarSubq = sharedSql(
    "q_scalar_subq", Seq("customer"),
    """SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal
      |FROM customer
      |WHERE CAST(c_acctbal AS DECIMAL(12,2)) >
      |  (SELECT CAST(AVG(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(12,2)) FROM customer)
      |ORDER BY c_custkey""".stripMargin)

  /** IN (subquery) — sql_bridge.rs:4208-4231. */
  val qInSubq = sharedSql(
    "q_in_subq", Seq("customer", "orders"),
    """SELECT o_orderstatus, COUNT(*) AS n
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin)

  /** Correlated EXISTS — native Catalyst decorrelation instead of the
    * reference's thread-local outer-row context + alias heuristics
    * (sql_bridge.rs:4233-4260, 4604-4706). */
  val qExistsCorr = sharedSql(
    "q_exists_corr", Seq("customer", "orders"),
    """SELECT c_custkey, c_mktsegment
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 470000)
      |ORDER BY c_custkey""".stripMargin)

  /** Correlated NOT EXISTS. */
  val qNotExistsCorr = sharedSql(
    "q_not_exists_corr", Seq("customer", "orders"),
    """SELECT c_custkey
      |FROM customer c
      |WHERE c_acctbal > 9000
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin)

  val all: Seq[Q] = Seq(
    qWinRank, qWinFrame, qWinLagLead, qWinNtile, qWinFirstLast, qWinRange,
    qCte, qCteRecursive, qScalarSubq, qInSubq, qExistsCorr, qNotExistsCorr)
}
