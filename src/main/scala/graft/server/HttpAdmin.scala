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
  *  - `GET /health/live` / `GET /health/ready` — the orchestrator
  *    probe split (health.rs:37-38): live answers without touching
  *    the engine (is the process up), ready answers 200 only while
  *    the engine is open (close() flips it to 503 until a write
  *    re-opens the engine).
  *  - `GET /performance[/queries|/cache|/connections]` — the JSON
  *    performance family (performance_routes.rs:36-44): latency
  *    summary + engine counters, the slow-statement log (ids and
  *    latencies only — statement TEXT stays behind the authenticated
  *    SHOW PERF, matching /metrics' redaction), result-cache stats,
  *    and wire-pool stats when a PgServer is attached.
  *
  * Built on the JDK's com.sun.net.httpserver — no extra dependency,
  * one daemon thread. Binds loopback by default, like PgServer.
  */
final class HttpAdmin(engine: QueryEngine, port: Int = 0,
    bind: String = "127.0.0.1",
    connStats: Option[() => PgServer.PoolTelemetry] = None) {

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

  // /alerts/history — the recorded state transitions (alert_routes.rs
  // get_alert_history). Ordinals are the engine's monotonic counter,
  // not timestamps: the surface stays deterministic.
  server.createContext("/alerts/history", ex =>
    try {
      engine.sql("SHOW ALERTS").collect() // evaluate -> record transitions
      val json = engine.alertTransitions.map { case (ord, name, from, to) =>
        s"""{"ordinal": $ord, "alert": ${jsonStr(name)}, """ +
          s""""from": ${jsonStr(from)}, "to": ${jsonStr(to)}}"""
      }.mkString("[", ", ", "]")
      respond(ex, 200, "application/json", json + "\n")
    } catch { case e: Exception =>
      respond(ex, 500, "application/json",
        s"""{"error": ${jsonStr(String.valueOf(e.getMessage))}}\n""")
    })

  // /alerts/rules — REST rule management (alert_routes.rs list_rules /
  // add_rule / delete_rule). Writes route through the SQL statements,
  // so the superuser gate, audit trail and catalog persistence all
  // apply exactly as if typed.
  server.createContext("/alerts/rules", ex =>
    try {
      val tail = ex.getRequestURI.getPath.stripPrefix("/alerts/rules")
        .stripPrefix("/")
      (ex.getRequestMethod, tail) match {
        case ("GET", "") =>
          val json = engine.alertRules.map { a =>
            s"""{"name": ${jsonStr(a.name)}, "metric": ${jsonStr(a.metric)}, """ +
              s""""op": ${jsonStr(a.op)}, "threshold": ${a.threshold}, """ +
              s""""severity": ${jsonStr(a.severity)}}"""
          }.mkString("[", ", ", "]")
          respond(ex, 200, "application/json", json + "\n")
        case ("POST", "") =>
          val body = new String(
            ex.getRequestBody.readNBytes(1 << 16),
            java.nio.charset.StandardCharsets.UTF_8)
          // the bare-value capture takes the WHOLE token (to the next
          // comma/brace), so a 1e-3 exponent form reaches validation
          // and is rejected — a loose [0-9.]+ would truncate it to "1"
          // and create a rule 1000x off its intended threshold
          def field(k: String): Option[String] =
            (s""""$k"\\s*:\\s*"([^"]*)"""".r.findFirstMatchIn(body) orElse
              s""""$k"\\s*:\\s*([^,}\\s"]+)""".r.findFirstMatchIn(body))
              .map(_.group(1))
          val name = field("name").getOrElse(
            throw new IllegalArgumentException("missing field: name"))
          val metric = field("metric").getOrElse(
            throw new IllegalArgumentException("missing field: metric"))
          val op = field("op").getOrElse(">")
          val threshold = field("threshold").getOrElse(
            throw new IllegalArgumentException("missing field: threshold"))
          require(Set(">", ">=", "<", "<=", "=")(op), s"bad op: $op")
          require(name.matches("\\w+") && metric.matches("\\w+") &&
            threshold.matches("-?\\d+(\\.\\d+)?"), "bad rule fields")
          val sev = field("severity").getOrElse("WARNING").toUpperCase
          require(Set("INFO", "WARNING", "CRITICAL", "FATAL")(sev),
            s"bad severity: $sev")
          engine.sql(
            s"CREATE ALERT $name ON $metric $op $threshold SEVERITY $sev")
          respond(ex, 201, "application/json",
            s"""{"created": ${jsonStr(name)}}""" + "\n")
        case ("DELETE", name) if name.nonEmpty && name.matches("\\w+") =>
          engine.sql(s"DROP ALERT $name")
          respond(ex, 200, "application/json",
            s"""{"deleted": ${jsonStr(name)}}""" + "\n")
        case (m, _) => respond(ex, 405, "application/json",
          s"""{"error": "unsupported: $m"}""" + "\n")
      }
    } catch { case e: Exception =>
      respond(ex, 400, "application/json",
        s"""{"error": ${jsonStr(String.valueOf(e.getMessage))}}\n""")
    })

  // com.sun.net.httpserver matches the LONGEST registered prefix, so
  // these subpaths win over the "/health" context above
  server.createContext("/health/live", ex =>
    // liveness never touches the engine: the process answering IS the
    // signal (health.rs liveness_check)
    respond(ex, 200, "application/json", """{"status": "alive"}""" + "\n"))

  server.createContext("/health/ready", ex =>
    try {
      // ready = the engine is open and its catalog answers (the writer
      // lock is taken lazily on first write, so lock state is a fact
      // for /health, not a readiness gate)
      val h = engine.healthSnapshot
      if (h.get("status").contains("ok"))
        respond(ex, 200, "application/json", """{"status": "ready"}""" + "\n")
      else
        respond(ex, 503, "application/json",
          """{"status": "not_ready"}""" + "\n")
    } catch { case e: Exception =>
      respond(ex, 503, "application/json",
        s"""{"status": "not_ready", "reason": ${jsonStr(String.valueOf(e.getMessage))}}\n""")
    })

  private def numJson(pairs: Seq[(String, String)]): String =
    pairs.map { case (k, v) => s"${jsonStr(k)}: $v" }.mkString("{", ", ", "}")

  server.createContext("/performance", ex =>
    try {
      val perf = engine.sql("SHOW PERF").collect()
      val summary = perf.filter(_.getString(0) == "summary")
        .map(r => r.getString(1) -> r.getDouble(2).toString).toSeq
      val counters = engine.sql("SHOW METRICS").collect()
        .map(r => r.getString(0) -> r.getLong(1).toString).toSeq
      respond(ex, 200, "application/json",
        s"""{"latency": ${numJson(summary)}, "counters": ${numJson(counters)}}""" + "\n")
    } catch { case e: Exception =>
      respond(ex, 500, "application/json",
        s"""{"error": ${jsonStr(String.valueOf(e.getMessage))}}\n""")
    })

  server.createContext("/performance/queries", ex =>
    try {
      // ids + latencies only: slow-log entries carry full SQL text
      // (with data literals), and this sidecar is unauthenticated —
      // the text stays behind the wire protocol's SHOW PERF, the same
      // redaction /metrics applies
      val rows = engine.sql("SHOW PERF").collect()
        .filter(_.getString(0) == "slow")
        .map(r => s"""{"id": ${jsonStr(r.getString(1))}, """ +
          s""""ms": ${r.getDouble(2)}}""")
      respond(ex, 200, "application/json",
        rows.mkString("[", ", ", "]") + "\n")
    } catch { case e: Exception =>
      respond(ex, 500, "application/json",
        s"""{"error": ${jsonStr(String.valueOf(e.getMessage))}}\n""")
    })

  server.createContext("/performance/cache", ex =>
    try {
      val r = engine.sql("SHOW CACHE").collect().head
      respond(ex, 200, "application/json", numJson(Seq(
        "enabled" -> r.getBoolean(0).toString,
        "entries" -> r.getLong(1).toString,
        "hits" -> r.getLong(2).toString,
        "misses" -> r.getLong(3).toString)) + "\n")
    } catch { case e: Exception =>
      respond(ex, 500, "application/json",
        s"""{"error": ${jsonStr(String.valueOf(e.getMessage))}}\n""")
    })

  server.createContext("/performance/memory", ex =>
    try {
      val rt = Runtime.getRuntime
      val mem = engine.spark.sparkContext.getExecutorMemoryStatus.values
      val (storMax, storFree) = mem.foldLeft((0L, 0L)) {
        case ((m, f), (em, ef)) => (m + em, f + ef)
      }
      respond(ex, 200, "application/json", numJson(Seq(
        "heap_used_bytes" -> (rt.totalMemory() - rt.freeMemory()).toString,
        "heap_max_bytes" -> rt.maxMemory().toString,
        "storage_memory_bytes" -> storMax.toString,
        "storage_memory_free_bytes" -> storFree.toString)) + "\n")
    } catch { case e: Exception =>
      respond(ex, 500, "application/json",
        s"""{"error": ${jsonStr(String.valueOf(e.getMessage))}}\n""")
    })

  // /performance/optimization (performance_routes.rs
  // get_optimization_suggestions): engine-derived advice — slow-log
  // pressure, snapshot replay lag on mutation-heavy tables, result-
  // cache hit rate, driver heap. Metadata + counters only, cheap to
  // poll.
  server.createContext("/performance/optimization", ex =>
    try {
      val suggestions = engine.optimizationSuggestions()
      val json = suggestions.map { case (cat, pri, text) =>
        s"""{"category": ${jsonStr(cat)}, "priority": ${jsonStr(pri)}, """ +
          s""""suggestion": ${jsonStr(text)}}"""
      }.mkString("[", ", ", "]")
      respond(ex, 200, "application/json",
        s"""{"total_suggestions": ${suggestions.length}, "suggestions": $json}""" + "\n")
    } catch { case e: Exception =>
      respond(ex, 500, "application/json",
        s"""{"error": ${jsonStr(String.valueOf(e.getMessage))}}\n""")
    })

  // live/accepted/rejected plus the advanced-pool telemetry
  // (advanced_pool.rs parity): idle-reap counts, reaper health sweeps
  // with recency, and accept-to-session-ready admission wait times
  server.createContext("/performance/connections", ex =>
    connStats match {
      case Some(f) =>
        val p = f()
        def ms(v: Double): String =
          String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
        respond(ex, 200, "application/json", numJson(Seq(
          "live" -> p.live.toString,
          "accepted" -> p.accepted.toString,
          "rejected" -> p.rejected.toString,
          "reaped" -> p.reaped.toString,
          "health_sweeps" -> p.healthSweeps.toString,
          "last_sweep_ms_ago" ->
            p.lastSweepMsAgo.map(_.toString).getOrElse("null"),
          "admissions" -> p.admissions.toString,
          "avg_admission_wait_ms" -> ms(p.avgAdmitWaitMs),
          "max_admission_wait_ms" -> ms(p.maxAdmitWaitMs),
          "max_connections" -> p.maxConnections.toString,
          "idle_timeout_ms" -> p.idleTimeoutMs.toString)) + "\n")
      case None => respond(ex, 404, "application/json",
        """{"error": "no wire server attached"}""" + "\n")
    })

  // /cluster — the SHOW CLUSTER surface over HTTP: replication links
  // (both roles) with sequence high-water marks and lag, plus the
  // leadership lease row when one is attached
  // (distributed_coordinator.rs:24-30 exposes cluster state the same
  // way). Metadata-scale: catalog counters only, no Spark job.
  server.createContext("/cluster", ex =>
    try {
      val json = engine.sql("SHOW CLUSTER").collect().map(r =>
        s"""{"kind": ${jsonStr(r.getString(0))}, "subject": ${jsonStr(r.getString(1))}, """ +
          s""""role": ${jsonStr(r.getString(2))}, "peer": ${jsonStr(r.getString(3))}, """ +
          s""""local_seq": ${r.getLong(4)}, "peer_seq": ${r.getLong(5)}, """ +
          s""""lag": ${r.getLong(6)}}""")
        .mkString("[", ", ", "]")
      respond(ex, 200, "application/json", json + "\n")
    } catch { case e: Exception =>
      respond(ex, 500, "application/json",
        s"""{"error": ${jsonStr(String.valueOf(e.getMessage))}}\n""")
    })

  // /matviews — the SHOW MATERIALIZED VIEWS surface over HTTP: name,
  // data version, maintenance kind, base tables with refresh horizons,
  // and stale_events (events appended to any base since the horizon).
  // Metadata-scale: a driver-side catalog walk, no Spark job.
  server.createContext("/matviews", ex =>
    try {
      val json = engine.sql("SHOW MATERIALIZED VIEWS").collect().map { r =>
        def optStr(i: Int) =
          if (r.isNullAt(i)) "null" else jsonStr(r.getString(i))
        val stale = if (r.isNullAt(6)) "null" else r.getLong(6).toString
        val every = if (r.isNullAt(8)) "null" else r.getLong(8).toString
        s"""{"name": ${jsonStr(r.getString(0))}, "version": ${r.getLong(1)}, """ +
          s""""kind": ${jsonStr(r.getString(2))}, """ +
          s""""autorefresh": ${r.getBoolean(3)}, """ +
          s""""base_tables": ${optStr(4)}, """ +
          s""""horizons": ${optStr(5)}, "stale_events": $stale, """ +
          s""""muted": ${r.getBoolean(7)}, "autorefresh_every": $every, """ +
          s""""quantile_exact": ${optStr(10)}}"""
      }.mkString("[", ", ", "]")
      respond(ex, 200, "application/json", json + "\n")
    } catch { case e: Exception =>
      respond(ex, 500, "application/json",
        s"""{"error": ${jsonStr(String.valueOf(e.getMessage))}}\n""")
    })

  // /traces — recorded statement traces (SET TRACE ON to record;
  // observability.rs:1-10 exposes span-instrumented operations the
  // same way). Driver memory only — the ring holds the newest 64
  // completed traces; no Spark job runs here.
  server.createContext("/traces", ex =>
    try {
      // Locale.ROOT formatting: the f-interpolator uses the JVM default
      // locale, and a de/fr locale renders %.3f with a comma — invalid
      // JSON
      def ms(v: Double): String =
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      val json = engine.tracer.traces.map { t =>
        val spans = t.spans.map(s =>
          s"""{"span_id": ${s.spanId}, "parent_span_id": ${s.parentId}, """ +
            s""""name": ${jsonStr(s.name)}, "detail": ${jsonStr(s.detail)}, """ +
            s""""start_ms": ${ms(s.startMs)}, "dur_ms": ${ms(s.durMs)}, """ +
            s""""ok": ${s.ok}}""").mkString("[", ", ", "]")
        s"""{"trace_id": ${t.traceId}, "statement": ${jsonStr(t.statement)}, """ +
          s""""total_ms": ${ms(t.totalMs)}, "spans": $spans}"""
      }.mkString("[", ", ", "]")
      respond(ex, 200, "application/json",
        s"""{"enabled": ${engine.tracer.enabled}, "traces": $json}""" + "\n")
    } catch { case e: Exception =>
      respond(ex, 500, "application/json",
        s"""{"error": ${jsonStr(String.valueOf(e.getMessage))}}\n""")
    })

  // ------------------------------------------------------ /status page

  private def htmlEsc(s: String): String = s.flatMap {
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '&' => "&amp;"
    case '"' => "&quot;"
    case c => c.toString
  }

  /** Render a (bounded) statement result as an HTML table. Every
    * statement surfaced here returns catalog-sized row counts
    * (metrics, perf summary, storage per table, alert rules). */
  private def htmlTable(df: org.apache.spark.sql.DataFrame,
      limit: Int = 200): String = {
    val cols = df.columns
    val rows = df.limit(limit).collect()
    val head = cols.map(c => s"<th>${htmlEsc(c)}</th>").mkString
    val body = rows.map(r => cols.indices.map(i =>
        s"<td>${htmlEsc(String.valueOf(r.get(i)))}</td>").mkString)
      .map(tds => s"<tr>$tds</tr>").mkString("\n")
    s"<table><thead><tr>$head</tr></thead><tbody>\n$body\n</tbody></table>"
  }

  /** `GET /status` — a one-page HTML dashboard over the live engine:
    * health tiles plus the SHOW METRICS / SHOW PERF / SHOW STORAGE /
    * SHOW ALERTS surfaces. The reference's admin TUI dashboard is a
    * stub (driftdb-admin/src/main.rs:864 prints "TUI dashboard would
    * launch here"); this serves the content it names. Read-only,
    * loopback-bound like every route here. */
  server.createContext("/status", ex =>
    try {
      val h = engine.healthSnapshot.toSeq.sortBy(_._1)
      val tiles = h.map { case (k, v) =>
        s"""<div class="tile"><div class="k">${htmlEsc(k)}</div>""" +
          s"""<div class="v">${htmlEsc(v)}</div></div>"""
      }.mkString("\n")
      def section(title: String)(df: => org.apache.spark.sql.DataFrame): String =
        try s"<h2>${htmlEsc(title)}</h2>\n${htmlTable(df)}"
        catch { case e: Exception =>
          s"<h2>${htmlEsc(title)}</h2><p class='err'>${htmlEsc(String.valueOf(e.getMessage))}</p>" }
      val page =
        s"""<!doctype html>
           |<html><head><meta charset="utf-8"><title>graft status</title>
           |<style>
           |body{font-family:system-ui,sans-serif;margin:2rem;color:#222}
           |h1{font-size:1.4rem} h2{font-size:1.1rem;margin-top:1.5rem}
           |.tiles{display:flex;flex-wrap:wrap;gap:.6rem}
           |.tile{border:1px solid #ccc;border-radius:6px;padding:.5rem .8rem}
           |.tile .k{font-size:.75rem;color:#666}
           |.tile .v{font-size:1.1rem;font-weight:600}
           |table{border-collapse:collapse;margin-top:.4rem}
           |th,td{border:1px solid #ddd;padding:.25rem .6rem;font-size:.85rem;text-align:left}
           |th{background:#f5f5f5} .err{color:#a00}
           |</style></head><body>
           |<h1>graft engine status</h1>
           |<div class="tiles">
           |$tiles
           |</div>
           |${section("Metrics")(engine.sql("SHOW METRICS"))}
           |${
             // summary + bucket rows only: slow-log entries carry full
             // SQL text, which stays behind the authenticated SHOW PERF
             // (the same redaction /metrics and /performance apply)
             section("Performance")(engine.sql("SHOW PERF")
               .where(org.apache.spark.sql.functions.col("kind")
                 .isin("summary", "bucket")))}
           |${section("Storage")(engine.sql("SHOW STORAGE"))}
           |${section("Alerts")(engine.sql("SHOW ALERTS"))}
           |</body></html>
           |""".stripMargin
      respond(ex, 200, "text/html; charset=utf-8", page)
    } catch { case e: Exception =>
      respond(ex, 500, "text/plain", s"status failed: ${e.getMessage}\n")
    })

  server.setExecutor(null) // serve on the dispatcher thread
  def start(): HttpAdmin = { server.start(); this }
  def close(): Unit = server.stop(0)
}
