package graft.server

import graft.exec.QueryEngine
import java.nio.charset.StandardCharsets.UTF_8

/** HTTP health + metrics endpoints over the engine — the observability
  * sidecar of the wire server (the reference serves the same two
  * surfaces: `/health` probes in driftdb-server/src/health.rs:1-272 and
  * Prometheus text metrics in metrics.rs:1-913).
  *
  *  - `GET /health`  — liveness JSON: catalog size, write-lock state,
  *    last durable publish age. No Spark job runs; a hung engine is
  *    visible as a hung probe, which is what an orchestrator's liveness
  *    check wants.
  *  - `GET /metrics` — the SHOW METRICS counters and the SHOW PERF
  *    latency summary in Prometheus text exposition format
  *    (`graft_<metric> value` gauges), so a standard scraper ingests
  *    them unmodified.
  *  - `GET /alerts` — the SHOW ALERTS rule evaluation as JSON (the
  *    reference's alert_routes.rs surface over alerting.rs).
  *
  * Built on the JDK's com.sun.net.httpserver — no extra dependency,
  * one daemon thread. Binds loopback by default, like PgServer.
  */
final class HttpAdmin(engine: QueryEngine, port: Int = 0,
    bind: String = "127.0.0.1") {

  private val server = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress(bind, port), 0)

  def boundPort: Int = server.getAddress.getPort

  private def respond(ex: com.sun.net.httpserver.HttpExchange,
      status: Int, contentType: String, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  server.createContext("/health", ex =>
    try {
      val h = engine.healthSnapshot
      val json = h.toSeq.sortBy(_._1)
        .map { case (k, v) =>
          val vs = if (v == "true" || v == "false" ||
            v.forall(c => c.isDigit || c == '-')) v else jsonStr(v)
          s"${jsonStr(k)}: $vs"
        }
        .mkString("{", ", ", "}")
      respond(ex, 200, "application/json", json + "\n")
    } catch { case e: Exception =>
      respond(ex, 500, "application/json",
        s"""{"status": "error", "error": ${jsonStr(String.valueOf(e.getMessage))}}\n""")
    })

  server.createContext("/metrics", ex =>
    try {
      val sb = new StringBuilder
      def gauge(name: String, value: String): Unit = {
        sb.append(s"# TYPE graft_$name gauge\n")
        sb.append(s"graft_$name $value\n")
      }
      // SHOW METRICS: deterministic engine counters
      for (r <- engine.sql("SHOW METRICS").collect())
        gauge(r.getString(0), r.getLong(1).toString)
      // SHOW PERF summary rows: wall-clock latency counters; bucket
      // rows become a labeled series (classic histogram-ish export)
      for (r <- engine.sql("SHOW PERF").collect()) r.getString(0) match {
        case "summary" => gauge("perf_" + r.getString(1), r.getDouble(2).toString)
        case "bucket" =>
          val l = r.getString(1)
          sb.append(s"""graft_perf_latency_bucket{le="$l"} ${r.getDouble(2)}\n""")
        case _ => () // slow-log entries carry SQL text; not for scrape
      }
      respond(ex, 200, "text/plain; version=0.0.4", sb.toString)
    } catch { case e: Exception =>
      respond(ex, 500, "text/plain", s"scrape failed: ${e.getMessage}\n")
    })

  server.createContext("/alerts", ex =>
    try {
      val rows = engine.sql("SHOW ALERTS").collect()
      val json = rows.map(r =>
        s"""{"alert": ${jsonStr(r.getString(0))}, "severity": ${jsonStr(r.getString(1))}, """ +
          s""""state": ${jsonStr(r.getString(2))}, "metric": ${jsonStr(r.getString(3))}, """ +
          s""""value": ${r.getLong(4)}, "threshold": ${r.getDouble(5)}}""")
        .mkString("[", ", ", "]")
      respond(ex, 200, "application/json", json + "\n")
    } catch { case e: Exception =>
      respond(ex, 500, "application/json",
        s"""{"error": ${jsonStr(String.valueOf(e.getMessage))}}\n""")
    })

  server.setExecutor(null) // serve on the dispatcher thread
  def start(): HttpAdmin = { server.start(); this }
  def close(): Unit = server.stop(0)
}
