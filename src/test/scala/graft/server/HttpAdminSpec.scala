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
}
