package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.H._

/** Core relational operators (SURVEY.md §2.1–§2.4, §2.6, §2.7): scans,
  * the full predicate set, aggregation/GROUP BY/HAVING, all five join
  * types plus semi/anti/self/multi-join, ORDER/LIMIT/OFFSET, DISTINCT,
  * and standard-semantics set operations (the reference's INTERSECT/
  * EXCEPT first-column bug — sql_bridge.rs:1087-1157 — is NOT
  * replicated; we implement full-row semantics).
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------- scans

  /** Projection + range/equality filter; pushdown reaches the parquet
    * scan (PushedFilters). Reference: full scan + predicate filter,
    * query/executor.rs:109-235. */
  val qScanFilter = Q(
    "q_scan_filter",
    """SELECT l_orderkey, l_linenumber, l_quantity,
      |       strftime(l_shipdate, '%Y-%m-%d') AS ship_day
      |FROM lineitem
      |WHERE l_returnflag = 'R' AND l_quantity < 5
      |  AND l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .where(col("l_returnflag") === "R" && col("l_quantity") < 5 &&
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** LIKE / NOT LIKE / IN — predicate.rs:38-167 operator set. */
  val qPredLikeIn = Q(
    "q_pred_like_in",
    """SELECT p_partkey, p_brand, p_type, p_size
      |FROM part
      |WHERE (p_type LIKE '%BRASS%' OR p_brand IN ('Brand#12','Brand#34'))
      |  AND p_name NOT LIKE '%green%'
      |  AND p_size BETWEEN 10 AND 40
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    t(s, dir, "part")
      .where((col("p_type").like("%BRASS%") ||
        col("p_brand").isin("Brand#12", "Brand#34")) &&
        !col("p_name").like("%green%") &&
        col("p_size").between(10, 40))
      .select("p_partkey", "p_brand", "p_type", "p_size")
      .orderBy("p_partkey")
  }

  /** IS NULL semantics via outer join (fixtures are NULL-free; the
    * reference treats missing keys as NULL — predicate.rs:42-48). The
    * orders side is restricted to big orders so some customers genuinely
    * lack a match — every customer has at least one order at sf0.01,
    * which made the unrestricted form verify on 0 rows. */
  val qPredNull = Q(
    "q_pred_null",
    """SELECT c.c_custkey, c.c_mktsegment
      |FROM customer c LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
      |  ON c.c_custkey = o.o_custkey
      |WHERE o.o_orderkey IS NULL
      |ORDER BY c.c_custkey""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").where(col("o_totalprice") > 400000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .where(col("o_orderkey").isNull)
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** CASE WHEN (simple + searched) and binary arithmetic with standard
    * typed semantics (not the reference's f64-first,
    * sql_bridge.rs:4941-4989). */
  val qCaseArith = Q(
    "q_case_arith",
    """SELECT o_orderkey,
      |       CASE WHEN o_totalprice > 300000 THEN 'big'
      |            WHEN o_totalprice > 150000 THEN 'mid'
      |            ELSE 'small' END AS bucket,
      |       CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(0.9 AS DECIMAL(8,4)) AS DOUBLE) AS discounted,
      |       o_orderkey % 7 AS modk
      |FROM orders
      |WHERE o_orderstatus = 'F' AND o_orderkey < 2000
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .where(col("o_orderstatus") === "F" && col("o_orderkey") < 2000)
      .select(col("o_orderkey"),
        when(col("o_totalprice") > 300000, "big")
          .when(col("o_totalprice") > 150000, "mid")
          .otherwise("small").as("bucket"),
        (dec2(col("o_totalprice")) * lit(0.9).cast("decimal(8,4)"))
          .cast("double").as("discounted"),
        (col("o_orderkey") % 7).as("modk"))
      .orderBy("o_orderkey")
  }

  // ----------------------------------------------------------- aggregates

  /** TPC-H Q1 shape: multi-aggregate GROUP BY with exact decimal money
    * arithmetic. Reference: execute_group_by_aggregation,
    * sql_bridge.rs:3806-4001. */
  val q1Agg = Q(
    "q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))), 4) AS DOUBLE) AS sum_disc_price,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))) * (CAST(1 AS DECIMAL(8,4)) + CAST(l_tax AS DECIMAL(8,4)))), 4) AS DOUBLE) AS sum_charge,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS DOUBLE) AS avg_qty,
      |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) / COUNT(l_discount) AS DOUBLE) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    val one4 = lit(1).cast("decimal(8,4)")
    t(s, dir, "lineitem")
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (one4 - dec4(col("l_discount"))))
          .cast("decimal(38,10)").r4.as("sum_disc_price"),
        sum(dec2(col("l_extendedprice")) * (one4 - dec4(col("l_discount"))) *
          (one4 + dec4(col("l_tax")))).cast("decimal(38,10)").r4
          .as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        (sum(dec4(col("l_discount"))).cast("double") / count(col("l_discount")))
          .cast("double").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Global aggregation, no GROUP BY — sql_bridge.rs:3785-3803. */
  val qGlobalAgg = Q(
    "q_global_agg",
    """SELECT COUNT(*) AS n_rows, COUNT(l_quantity) AS n_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
      |  CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
      |  CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
      |  COUNT(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      count(col("l_quantity")).as("n_qty"),
      dsum(col("l_extendedprice")).as("sum_price"),
      min(col("l_extendedprice")).cast("double").as("min_price"),
      max(col("l_extendedprice")).cast("double").as("max_price"),
      countDistinct(col("l_orderkey")).as("n_orders"))
  }

  /** COUNT(DISTINCT ...) — correct semantics, unlike the reference which
    * drops the qualifier ([REF-BUG] sql_bridge.rs:4017-4077). */
  val qCountDistinct = Q(
    "q_count_distinct",
    """SELECT l_returnflag,
      |       COUNT(DISTINCT l_orderkey) AS n_orders,
      |       COUNT(DISTINCT l_suppkey) AS n_supps,
      |       COUNT(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** HAVING over aggregates — sql_bridge.rs:4190-4200. */
  val qHaving = Q(
    "q_having",
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spent
      |FROM orders
      |GROUP BY o_custkey
      |HAVING COUNT(*) >= 15 AND SUM(CAST(o_totalprice AS DECIMAL(12,2))) > 2000000
      |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(dec2(col("o_totalprice"))).as("_ts"))
      .where(col("n_orders") >= 15 && col("_ts") > 2000000)
      .select(col("o_custkey"), col("n_orders"),
        col("_ts").cast("double").as("total_spent"))
      .orderBy("o_custkey")
  }

  /** ROLLUP — a strict superset of the reference (absent there,
    * SURVEY §2.4); free in Spark. */
  val qRollup = Q(
    "q_rollup",
    """SELECT COALESCE(r_name, '##ALL##') AS region_name,
      |       COALESCE(n_name, '##ALL##') AS nation_name,
      |       COUNT(*) AS n_cust
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY region_name, nation_name""".stripMargin) { (s, dir) =>
    // Same ANSI text through spark.sql; nation/region are auto-broadcast.
    Seq("customer", "nation", "region").foreach(Tables.view(s, dir, _))
    s.sql("""SELECT COALESCE(r_name, '##ALL##') AS region_name,
            |       COALESCE(n_name, '##ALL##') AS nation_name,
            |       COUNT(*) AS n_cust
            |FROM customer
            |JOIN nation ON c_nationkey = n_nationkey
            |JOIN region ON n_regionkey = r_regionkey
            |GROUP BY ROLLUP(r_name, n_name)
            |ORDER BY region_name, nation_name""".stripMargin)
  }

  /** GROUPING SETS with GROUPING() disambiguation — the general form
    * ROLLUP/CUBE specialize ([REF-GAP]: the reference has neither).
    * GROUPING() flags distinguish a NULL-as-total from NULL data, the
    * standard trap of grouping-set results. */
  val qGroupingSets = Q(
    "q_grouping_sets",
    """SELECT COALESCE(r_name, '##ALL##') AS region_name,
      |       COALESCE(n_name, '##ALL##') AS nation_name,
      |       GROUPING(r_name) AS g_region, GROUPING(n_name) AS g_nation,
      |       COUNT(*) AS n_cust
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY GROUPING SETS ((r_name, n_name), (r_name), (n_name), ())
      |ORDER BY region_name, nation_name, g_region, g_nation""".stripMargin) { (s, dir) =>
    Seq("customer", "nation", "region").foreach(Tables.view(s, dir, _))
    s.sql("""SELECT COALESCE(r_name, '##ALL##') AS region_name,
            |       COALESCE(n_name, '##ALL##') AS nation_name,
            |       GROUPING(r_name) AS g_region, GROUPING(n_name) AS g_nation,
            |       COUNT(*) AS n_cust
            |FROM customer
            |JOIN nation ON c_nationkey = n_nationkey
            |JOIN region ON n_regionkey = r_regionkey
            |GROUP BY GROUPING SETS ((r_name, n_name), (r_name), (n_name), ())
            |ORDER BY region_name, nation_name, g_region, g_nation""".stripMargin)
  }

  /** Exact (non-approximate) ordered-set aggregates: PERCENTILE_CONT /
    * PERCENTILE_DISC / MEDIAN per group. Linear interpolation over
    * small integral quantities is exact in IEEE754, so the doubles are
    * bit-comparable across engines. */
  val qPercentiles = Q(
    "q_percentiles",
    """SELECT l_returnflag,
      |       CAST(PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE) AS p25,
      |       CAST(MEDIAN(l_quantity) AS DOUBLE) AS p50,
      |       CAST(PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE) AS p75,
      |       CAST(PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE) AS p90d
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.view(s, dir, "lineitem")
    s.sql("""SELECT l_returnflag,
            |       CAST(PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE) AS p25,
            |       CAST(MEDIAN(l_quantity) AS DOUBLE) AS p50,
            |       CAST(PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE) AS p75,
            |       CAST(PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE) AS p90d
            |FROM lineitem
            |GROUP BY l_returnflag
            |ORDER BY l_returnflag""".stripMargin)
  }

  /** PIVOT: long→wide by order status. The Spark side uses the native
    * PIVOT clause; the oracle states the same contract as conditional
    * aggregation — so the check pins PIVOT's semantics (grouping,
    * value matching, absent-combination NULLs → 0 via COALESCE), not
    * its syntax. */
  val qPivot = Q(
    "q_pivot",
    """SELECT n_name,
      |       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS st_open,
      |       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS st_filled,
      |       CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS st_partial
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin) { (s, dir) =>
    Seq("orders", "customer", "nation").foreach(Tables.view(s, dir, _))
    s.sql("""SELECT n_name,
            |       COALESCE(st_open, 0) AS st_open,
            |       COALESCE(st_filled, 0) AS st_filled,
            |       COALESCE(st_partial, 0) AS st_partial
            |FROM (
            |  SELECT n_name, o_orderstatus
            |  FROM orders
            |  JOIN customer ON o_custkey = c_custkey
            |  JOIN nation ON c_nationkey = n_nationkey)
            |PIVOT (COUNT(*) FOR o_orderstatus IN ('O' AS st_open, 'F' AS st_filled, 'P' AS st_partial))
            |ORDER BY n_name""".stripMargin)
  }

  // ---------------------------------------------------------------- joins

  /** INNER 3-way join + agg + top-k (TPC-H Q3 shape). The dimension
    * side is broadcast; the orders⋈lineitem join shuffles on orderkey.
    * Reference: perform_inner_hash_join sql_bridge.rs:3258-3313. */
  val qJoinInner = Q(
    "q_join_inner",
    """SELECT l_orderkey,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))), 4) AS DOUBLE) AS revenue,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_day
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1995-03-15'
      |  AND l_shipdate  > TIMESTAMP '1995-03-15'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin) { (s, dir) =>
    val one4 = lit(1).cast("decimal(8,4)")
    val c = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders")
      .where(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
    val l = t(s, dir, "lineitem")
      .where(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(dec2(col("l_extendedprice")) * (one4 - dec4(col("l_discount"))))
        .cast("decimal(38,10)").r4.as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** LEFT OUTER join with NULL-preserving aggregation —
    * sql_bridge.rs:3152-3189. */
  val qJoinLeft = Q(
    "q_join_left",
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
      |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS spent
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |WHERE c_custkey <= 300
      |GROUP BY c_custkey
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer").where(col("c_custkey") <= 300)
    val o = t(s, dir, "orders")
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(dec2(col("o_totalprice"))), lit(0))
          .cast("double").as("spent"))
      .orderBy("c_custkey")
  }

  /** RIGHT OUTER join (reference rewrites as swapped LEFT,
    * sql_bridge.rs:1676-1683; Spark supports it natively). */
  val qJoinRight = Q(
    "q_join_right",
    """SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS n_big
      |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey AND o_totalprice > 400000
      |WHERE c_custkey <= 200
      |GROUP BY c_custkey, c_mktsegment
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer").where(col("c_custkey") <= 200)
    o.join(c, col("o_custkey") === col("c_custkey") &&
        col("o_totalprice") > 400000, "right")
      .groupBy("c_custkey", "c_mktsegment")
      .agg(count(col("o_orderkey")).as("n_big"))
      .orderBy("c_custkey")
  }

  /** FULL OUTER join with unmatched rows on both sides —
    * sql_bridge.rs:3194-3246. */
  val qJoinFull = Q(
    "q_join_full",
    """WITH big AS (
      |  SELECT o_custkey AS k, COUNT(*) AS n_big FROM orders
      |  WHERE o_totalprice > 450000 GROUP BY o_custkey),
      |neg AS (
      |  SELECT c_custkey AS k, CAST(c_acctbal AS DOUBLE) AS bal
      |  FROM customer WHERE c_acctbal < -900)
      |SELECT COALESCE(big.k, neg.k) AS custkey, n_big, bal
      |FROM big FULL OUTER JOIN neg ON big.k = neg.k
      |ORDER BY custkey""".stripMargin) { (s, dir) =>
    val big = t(s, dir, "orders").where(col("o_totalprice") > 450000)
      .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_big"))
    val neg = t(s, dir, "customer").where(col("c_acctbal") < -900)
      .select(col("c_custkey").as("k2"), col("c_acctbal").cast("double").as("bal"))
    big.join(neg, col("k") === col("k2"), "full")
      .select(coalesce(col("k"), col("k2")).as("custkey"), col("n_big"), col("bal"))
      .orderBy("custkey")
  }

  /** CROSS join — sql_bridge.rs:3327-3339. */
  val qJoinCross = Q(
    "q_join_cross",
    """SELECT a.r_name AS r1, b.r_name AS r2
      |FROM region a CROSS JOIN region b
      |ORDER BY r1, r2""".stripMargin) { (s, dir) =>
    val a = t(s, dir, "region").select(col("r_name").as("r1"))
    val b = t(s, dir, "region").select(col("r_name").as("r2"))
    a.crossJoin(b).orderBy("r1", "r2")
  }

  /** Semi join (EXISTS pattern — sql_bridge.rs:4233-4260) via Spark's
    * native left_semi. */
  val qSemiJoin = Q(
    "q_semi_join",
    """SELECT c_custkey, c_mktsegment
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").where(col("o_totalprice") > 450000)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Anti join (NOT EXISTS pattern — sql_bridge.rs:4218) via left_anti.
    * Restricted to big orders so the anti side is non-empty at sf0.01
    * (202 customers lack a >400k order; none lack an order outright). */
  val qAntiJoin = Q(
    "q_anti_join",
    """SELECT c_custkey, c_mktsegment
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").where(col("o_totalprice") > 400000)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Self join via aliases — sql_bridge.rs:1861-1898: nation pairs
    * within a region. */
  val qSelfJoin = Q(
    "q_self_join",
    """SELECT a.n_name AS n1, b.n_name AS n2, a.n_regionkey AS rk
      |FROM nation a JOIN nation b
      |  ON a.n_regionkey = b.n_regionkey AND a.n_name < b.n_name
      |ORDER BY rk, n1, n2""".stripMargin) { (s, dir) =>
    val a = t(s, dir, "nation").alias("a")
    val b = t(s, dir, "nation").alias("b")
    a.join(b, col("a.n_regionkey") === col("b.n_regionkey") &&
        col("a.n_name") < col("b.n_name"))
      .select(col("a.n_name").as("n1"), col("b.n_name").as("n2"),
        col("a.n_regionkey").as("rk"))
      .orderBy("rk", "n1", "n2")
  }

  /** 5-way multi-join (TPC-H Q5 shape) — the reference's cost-seeded
    * multi-join planner (sql_bridge.rs:2282-2546) is subsumed by
    * Catalyst join reordering + broadcast of the dimension chain. */
  val qMultiJoin = Q(
    "q_multi_join",
    """SELECT r_name, n_name,
      |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))), 4) AS DOUBLE) AS revenue
      |FROM region
      |JOIN nation   ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders   ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01'
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
    val one4 = lit(1).cast("decimal(8,4)")
    val r = t(s, dir, "region")
    val n = t(s, dir, "nation")
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = t(s, dir, "lineitem")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(sum(dec2(col("l_extendedprice")) * (one4 - dec4(col("l_discount"))))
        .cast("decimal(38,10)").r4.as("revenue"))
      .orderBy("r_name", "n_name")
  }

  // --------------------------------------------- sort / limit / distinct

  /** ORDER BY ... LIMIT — Spark plans TakeOrderedAndProject (top-k
    * without a total sort). Reference: sort + truncate §2.6. */
  val qTopK = Q(
    "q_topk",
    """SELECT l_orderkey, l_linenumber, CAST(l_extendedprice AS DOUBLE) AS price
      |FROM lineitem
      |ORDER BY price DESC, l_orderkey, l_linenumber
      |LIMIT 15""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast("double").as("price"))
      .orderBy(col("price").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(15)
  }

  /** LIMIT + OFFSET — sql_bridge.rs:5451-5472. */
  val qOffset = Q(
    "q_offset",
    """SELECT o_orderkey, o_orderstatus
      |FROM orders
      |ORDER BY o_orderkey
      |LIMIT 20 OFFSET 100""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .select("o_orderkey", "o_orderstatus")
      .orderBy("o_orderkey")
      .offset(100).limit(20)
  }

  /** Salted skew join (operators/SkewJoin): a heavy-hitter fact key is
    * spread over (key, salt) sub-keys with the dim side replicated —
    * the manual fix for single-key skew AQE's partition splitting
    * cannot touch. The oracle is the PLAIN join: salting must be
    * invisible in the result. */
  val qSkewJoin = Q(
    "q_skew_join",
    """SELECT l_orderkey, l_linenumber, l_partkey, p_brand
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_quantity >= 45
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    val li = t(s, dir, "lineitem").where(col("l_quantity") >= 45)
      .select("l_orderkey", "l_linenumber", "l_partkey")
    val dim = t(s, dir, "part")
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    graft.operators.SkewJoin.saltedJoin(li, dim, "l_partkey", salts = 8)
      .select("l_orderkey", "l_linenumber", "l_partkey", "p_brand")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** SELECT DISTINCT (typed full-row dedup, not the reference's
    * JSON-string dedup — sql_bridge.rs:5343-5358). */
  val qDistinct = Q(
    "q_distinct",
    """SELECT DISTINCT l_returnflag, l_linestatus
      |FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")
  }

  // ------------------------------------------------------------- set ops

  /** UNION (distinct) — sql_bridge.rs:1020-1085. */
  val qUnion = Q(
    "q_union",
    """SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9900
      |UNION
      |SELECT o_custkey AS k FROM orders WHERE o_totalprice > 500000
      |ORDER BY k""".stripMargin) { (s, dir) =>
    val a = t(s, dir, "customer").where(col("c_acctbal") > 9900)
      .select(col("c_custkey").as("k"))
    val b = t(s, dir, "orders").where(col("o_totalprice") > 500000)
      .select(col("o_custkey").as("k"))
    a.union(b).distinct().orderBy("k")
  }

  /** UNION ALL keeps duplicates. */
  val qUnionAll = Q(
    "q_union_all",
    """SELECT k, COUNT(*) AS n FROM (
      |  SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000
      |  UNION ALL
      |  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 450000
      |) u GROUP BY k ORDER BY k""".stripMargin) { (s, dir) =>
    val a = t(s, dir, "customer").where(col("c_acctbal") > 9000)
      .select(col("c_custkey").as("k"))
    val b = t(s, dir, "orders").where(col("o_totalprice") > 450000)
      .select(col("o_custkey").as("k"))
    a.union(b).groupBy("k").agg(count(lit(1)).as("n")).orderBy("k")
  }

  /** INTERSECT with standard full-row semantics ([REF-BUG]
    * first-column-only at sql_bridge.rs:1087-1124 NOT replicated). */
  val qIntersect = Q(
    "q_intersect",
    """SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
      |INTERSECT
      |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY k""".stripMargin) { (s, dir) =>
    val a = t(s, dir, "customer").where(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("k"))
    val b = t(s, dir, "orders").where(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("k"))
    a.intersect(b).orderBy("k")
  }

  /** EXCEPT with standard full-row semantics ([REF-BUG]
    * sql_bridge.rs:1126-1157 NOT replicated). */
  val qExcept = Q(
    "q_except",
    """SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000
      |EXCEPT
      |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY k""".stripMargin) { (s, dir) =>
    val a = t(s, dir, "customer").where(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("k"))
    val b = t(s, dir, "orders").where(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("k"))
    a.except(b).orderBy("k")
  }

  val all: Seq[Q] = Seq(
    qScanFilter, qPredLikeIn, qPredNull, qCaseArith,
    q1Agg, qGlobalAgg, qCountDistinct, qHaving, qRollup,
    qGroupingSets, qPercentiles, qPivot, qSkewJoin,
    qJoinInner, qJoinLeft, qJoinRight, qJoinFull, qJoinCross,
    qSemiJoin, qAntiJoin, qSelfJoin, qMultiJoin,
    qTopK, qOffset, qDistinct,
    qUnion, qUnionAll, qIntersect, qExcept)
}
