package graft.server

import graft.TestSpark
import graft.exec.QueryEngine
import org.scalatest.funsuite.AnyFunSuite

/** Scrapes the HTTP health/metrics endpoints with a plain JDK client —
  * exactly what an orchestrator probe or Prometheus scraper does. */
class HttpAdminSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def get(port: Int, path: String): (Int, String, String) = {
    val conn = new java.net.URL(s"http://127.0.0.1:$port$path")
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(5000); conn.setReadTimeout(10000)
    val code = conn.getResponseCode
    val body = new String(
      (if (code < 400) conn.getInputStream else conn.getErrorStream).readAllBytes(),
      "UTF-8")
    (code, body, Option(conn.getContentType).getOrElse(""))
  }

  test("/health reports liveness facts; /metrics serves Prometheus text") {
    val e = QueryEngine.scratch(spark)
    val srv = new HttpAdmin(e, 0).start()
    try {
      e.sql("CREATE TABLE h (k BIGINT PRIMARY KEY, v DOUBLE)")
      e.sql("INSERT INTO h VALUES (1, 1.5), (2, 2.5)")

      val (hc, health, htype) = get(srv.boundPort, "/health")
      assert(hc === 200, health)
      assert(htype.startsWith("application/json"))
      assert(health.contains("\"status\": \"ok\""), health)
      assert(health.contains("\"tables\": 1"), health)
      assert(health.contains("\"write_lock_held\": true"), health)
      // the INSERT published moments ago — age must be a small number
      val age = "\"last_publish_age_ms\": (\\d+)".r
        .findFirstMatchIn(health).map(_.group(1).toLong)
      assert(age.exists(a => a >= 0 && a < 60000), health)

      val (mc, metrics, mtype) = get(srv.boundPort, "/metrics")
      assert(mc === 200, metrics)
      assert(mtype.startsWith("text/plain"))
      // SHOW METRICS counters as gauges, with TYPE headers
      assert(metrics.contains("# TYPE graft_statements_total gauge"), metrics)
      assert("graft_statements_total (\\d+)".r.findFirstMatchIn(metrics)
        .exists(_.group(1).toLong >= 2L), metrics)
      assert(metrics.contains("graft_tables 1"), metrics)
      // SHOW PERF summary + labeled latency buckets
      assert(metrics.contains("graft_perf_statements"), metrics)
      assert(metrics.contains("graft_perf_latency_bucket{le=\"lt_1ms\"}"), metrics)

      // alert rules evaluate on scrape: /alerts shows the firing rule
      e.sql("CREATE ALERT busy ON statements_total > 1 SEVERITY CRITICAL")
      val (ac, alerts, atype) = get(srv.boundPort, "/alerts")
      assert(ac === 200, alerts)
      assert(atype.startsWith("application/json"))
      assert(alerts.contains("\"alert\": \"busy\""), alerts)
      assert(alerts.contains("\"state\": \"FIRING\""), alerts)
      assert(alerts.contains("\"severity\": \"CRITICAL\""), alerts)

      // unknown path answers 404, not a hang
      val (nc, _, _) = get(srv.boundPort, "/nope")
      assert(nc === 404)
    } finally { srv.close(); e.close() }
  }

  test("/health/live and /health/ready split liveness from readiness") {
    val e = QueryEngine.scratch(spark)
    val srv = new HttpAdmin(e, 0).start()
    try {
      val (lc, live, _) = get(srv.boundPort, "/health/live")
      assert(lc === 200 && live.contains("alive"), live)
      val (rc, ready, _) = get(srv.boundPort, "/health/ready")
      assert(rc === 200 && ready.contains("\"ready\""), ready)
      // a closed engine must stop advertising readiness (while the
      // process — and so /health/live — stays up), and a write through
      // the engine re-opens it
      e.close()
      val (cc, closed, _) = get(srv.boundPort, "/health/ready")
      assert(cc === 503 && closed.contains("not_ready"), closed)
      val (lc2, live2, _) = get(srv.boundPort, "/health/live")
      assert(lc2 === 200, live2)
      e.sql("CREATE TABLE reopen (k BIGINT PRIMARY KEY)")
      val (rc2, ready2, _) = get(srv.boundPort, "/health/ready")
      assert(rc2 === 200 && ready2.contains("\"ready\""), ready2)
    } finally {
      srv.close(); e.close()
    }
  }

  test("/performance family serves latency, slow log, cache, pool stats") {
    val e = QueryEngine.scratch(spark)
    val srv = new HttpAdmin(e, 0,
      connStats = Some(() => graft.server.PgServer.PoolTelemetry(
        live = 3, accepted = 7L, rejected = 1L, reaped = 2L,
        healthSweeps = 5L, lastSweepMsAgo = Some(40L), admissions = 7L,
        admitWaitNsTotal = 14_000_000L, admitWaitNsMax = 4_000_000L,
        maxConnections = 100, idleTimeoutMs = 300000L))).start()
    try {
      e.sql("CREATE TABLE p (k BIGINT PRIMARY KEY)")
      e.sql("SET SLOW_LOG 0") // threshold 0 logs nothing; set real one
      e.sql("SET SLOW_LOG 1")
      e.sql("INSERT INTO p VALUES (1), (2), (3)") // statement > 1ms

      val (oc, overview, otype) = get(srv.boundPort, "/performance")
      assert(oc === 200, overview)
      assert(otype.startsWith("application/json"))
      assert(overview.contains("\"latency\""), overview)
      assert(overview.contains("\"p95_ms\""), overview)
      assert(overview.contains("\"counters\""), overview)
      assert(overview.contains("\"statements_total\""), overview)

      val (qc, slow, _) = get(srv.boundPort, "/performance/queries")
      assert(qc === 200, slow)
      // entries surface as id + latency; the SQL text itself is
      // redacted from the unauthenticated sidecar
      assert(slow.contains("\"id\": \"stmt_") && slow.contains("\"ms\":"), slow)
      assert(!slow.contains("INSERT INTO p"), slow)

      val (cc, cache, _) = get(srv.boundPort, "/performance/cache")
      assert(cc === 200, cache)
      assert(cache.contains("\"hits\"") && cache.contains("\"entries\""), cache)

      val (pc, pool, _) = get(srv.boundPort, "/performance/connections")
      assert(pc === 200, pool)
      assert(pool.contains("\"live\": 3"), pool)
      assert(pool.contains("\"accepted\": 7"), pool)
      assert(pool.contains("\"rejected\": 1"), pool)
      // advanced-pool telemetry: reap counts, health-check sweeps with
      // recency, and admission wait-time aggregates
      assert(pool.contains("\"reaped\": 2"), pool)
      assert(pool.contains("\"health_sweeps\": 5"), pool)
      assert(pool.contains("\"last_sweep_ms_ago\": 40"), pool)
      assert(pool.contains("\"admissions\": 7"), pool)
      assert(pool.contains("\"avg_admission_wait_ms\": 2.000"), pool)
      assert(pool.contains("\"max_admission_wait_ms\": 4.000"), pool)
      assert(pool.contains("\"max_connections\": 100"), pool)
      assert(pool.contains("\"idle_timeout_ms\": 300000"), pool)

      val (mc2, mem, _) = get(srv.boundPort, "/performance/memory")
      assert(mc2 === 200, mem)
      val heap = "\"heap_used_bytes\": (\\d+)".r
        .findFirstMatchIn(mem).map(_.group(1).toLong)
      assert(heap.exists(_ > 0), mem)
      assert(mem.contains("\"storage_memory_bytes\""), mem)
    } finally {
      srv.close(); e.close()
    }
  }

  test("/alerts/rules REST management and /alerts/history transitions") {
    val e = QueryEngine.scratch(spark)
    val srv = new HttpAdmin(e, 0).start()
    try {
      // POST creates through the governed SQL path
      val conn = new java.net.URL(
        s"http://127.0.0.1:${srv.boundPort}/alerts/rules")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      conn.getOutputStream.write(
        """{"name": "tbl_alert", "metric": "tables", "op": ">=",
          |"threshold": 1, "severity": "INFO"}""".stripMargin.getBytes("UTF-8"))
      assert(conn.getResponseCode === 201)

      val (lc, listed, _) = get(srv.boundPort, "/alerts/rules")
      assert(lc === 200, listed)
      assert(listed.contains("\"tbl_alert\"") &&
        listed.contains("\"tables\""), listed)

      // a table appears -> the rule fires; history records the
      // PENDING -> FIRING transition with a monotonic ordinal
      e.sql("CREATE TABLE a1 (k BIGINT PRIMARY KEY)")
      val (hc, hist, _) = get(srv.boundPort, "/alerts/history")
      assert(hc === 200, hist)
      assert(hist.contains("\"alert\": \"tbl_alert\"") &&
        hist.contains("\"to\": \"FIRING\""), hist)

      // DELETE removes the rule; the history keeps its past
      val del = new java.net.URL(
        s"http://127.0.0.1:${srv.boundPort}/alerts/rules/tbl_alert")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      del.setRequestMethod("DELETE")
      assert(del.getResponseCode === 200)
      val (_, rules2, _) = get(srv.boundPort, "/alerts/rules")
      assert(!rules2.contains("tbl_alert"), rules2)
      val (_, hist2, _) = get(srv.boundPort, "/alerts/history")
      assert(hist2.contains("tbl_alert"), hist2)

      // malformed POST is a clean 400, not a crash
      val bad = new java.net.URL(
        s"http://127.0.0.1:${srv.boundPort}/alerts/rules")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      bad.setRequestMethod("POST"); bad.setDoOutput(true)
      bad.getOutputStream.write("""{"name": "x; DROP"}""".getBytes("UTF-8"))
      assert(bad.getResponseCode === 400)
    } finally {
      srv.close(); e.close()
    }
  }

  test("/performance/optimization serves engine-derived suggestions") {
    val e = QueryEngine.scratch(spark)
    val srv = new HttpAdmin(e, 0).start()
    try {
      val (c0, quiet, _) = get(srv.boundPort, "/performance/optimization")
      assert(c0 === 200, quiet)
      assert(quiet.contains("\"total_suggestions\""), quiet)
      // trip the slow log -> a high-priority query_performance entry
      e.sql("CREATE TABLE o (k BIGINT PRIMARY KEY)")
      e.sql("SET SLOW_LOG 1")
      e.sql("INSERT INTO o VALUES (1), (2)")
      val (c1, busy, _) = get(srv.boundPort, "/performance/optimization")
      assert(c1 === 200, busy)
      assert(busy.contains("\"query_performance\"") &&
        busy.contains("\"high\""), busy)
    } finally {
      srv.close(); e.close()
    }
  }

  test("/cluster serves replication links as JSON") {
    val e = QueryEngine.scratch(spark)
    val srv = new HttpAdmin(e, 0).start()
    try {
      val (c0, empty, ct) = get(srv.boundPort, "/cluster")
      assert(c0 === 200 && ct.startsWith("application/json"))
      assert(empty.trim === "[]")
      // wire a real follower and scrape its lag through HTTP
      e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY)")
      e.sql("INSERT INTO t VALUES (1), (2)")
      val bdir = java.nio.file.Files.createTempDirectory("graft-http-bk-").toString
      e.sql(s"BACKUP DATABASE TO '$bdir/b'")
      val replica = new QueryEngine(spark,
        java.nio.file.Files.createTempDirectory("graft-http-repl-").toString)
      replica.sql(s"RESTORE DATABASE FROM '$bdir/b'")
      val ckpt = java.nio.file.Files.createTempDirectory("graft-http-ck-").toString
      graft.streaming.Replication.follow(e, replica, "t", ckpt)
        .awaitTermination()
      e.sql("INSERT INTO t VALUES (3)")
      val (c1, body, _) = get(srv.boundPort, "/cluster")
      assert(c1 === 200, body)
      assert(body.contains("\"role\": \"primary\"") &&
        body.contains("\"lag\": 1"), body)
      replica.close()
    } finally {
      srv.close(); e.close()
    }
  }

  test("/matviews serves view kind, horizons and staleness as JSON") {
    val e = QueryEngine.scratch(spark)
    val srv = new HttpAdmin(e, 0).start()
    try {
      val (c0, empty, ct) = get(srv.boundPort, "/matviews")
      assert(c0 === 200 && ct.startsWith("application/json"))
      assert(empty.trim === "[]")
      e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY, g STRING, v BIGINT)")
      e.sql("INSERT INTO t VALUES (1,'a',10)")
      e.sql("""CREATE MATERIALIZED VIEW hv AS
              |SELECT g, COUNT(*) AS n, SUM(v) AS sv FROM t GROUP BY g""".stripMargin)
      e.sql("INSERT INTO t VALUES (2,'b',20)")
      val (c1, body, _) = get(srv.boundPort, "/matviews")
      assert(c1 === 200, body)
      assert(body.contains("\"name\": \"hv\"") &&
        body.contains("\"kind\": \"incremental\"") &&
        body.contains("\"autorefresh\": false") &&
        body.contains("\"horizons\": \"t@1\"") &&
        body.contains("\"stale_events\": 1"), body)
    } finally {
      srv.close(); e.close()
    }
  }

  test("/traces serves recorded statement span trees as JSON") {
    val e = QueryEngine.scratch(spark)
    val srv = new HttpAdmin(e, 0).start()
    try {
      val (c0, off, ct) = get(srv.boundPort, "/traces")
      assert(c0 === 200 && ct.startsWith("application/json"))
      assert(off.contains("\"enabled\": false") &&
        off.contains("\"traces\": []"), off)
      e.sql("CREATE TABLE t (k BIGINT PRIMARY KEY)")
      e.sql("SET TRACE ON")
      e.sql("INSERT INTO t VALUES (1)")
      val (c1, body, _) = get(srv.boundPort, "/traces")
      assert(c1 === 200, body)
      assert(body.contains("\"enabled\": true"), body)
      assert(body.contains("\"name\": \"statement\"") &&
        body.contains("\"name\": \"publish\"") &&
        body.contains("INSERT INTO t VALUES (1)"), body)
    } finally {
      srv.close(); e.close()
    }
  }

  test("/performance/connections without a wire server answers 404") {
    val e = QueryEngine.scratch(spark)
    val srv = new HttpAdmin(e, 0).start()
    try {
      val (pc, body, _) = get(srv.boundPort, "/performance/connections")
      assert(pc === 404, body)
    } finally {
      srv.close(); e.close()
    }
  }

  test("/status serves a one-page HTML dashboard with live counters") {
    val e = QueryEngine.scratch(spark)
    val srv = new HttpAdmin(e, 0).start()
    try {
      e.sql("CREATE TABLE st (k BIGINT PRIMARY KEY, v DOUBLE)")
      e.sql("INSERT INTO st VALUES (1, 1.5), (2, 2.5)")
      e.sql("CREATE ALERT hot ON statements_total > 1 SEVERITY WARNING")
      val (c, page, ctype) = get(srv.boundPort, "/status")
      assert(c === 200, page)
      assert(ctype.startsWith("text/html"), ctype)
      // health tiles embed the live snapshot
      assert(page.contains("graft engine status"), page.take(400))
      assert(page.contains("write_lock_held"), page.take(400))
      // each SHOW surface renders as a table with live values
      assert(page.contains("statements_total"), "metrics missing")
      assert(page.contains("p95_ms"), "perf summary missing")
      assert(page.contains("<td>st</td>"), "storage row missing")
      assert(page.contains("hot"), "alert rule missing")
      // slow-log SQL text stays redacted on this unauthenticated page
      assert(!page.contains("INSERT INTO st"), "statement text leaked")
      // escaping: nothing renders as a raw script context
      assert(!page.contains("<script"), "unexpected script tag")
    } finally {
      srv.close(); e.close()
    }
  }
}
