package graft

import graft.exec.QueryEngine
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Command-line entry point — the reference's `driftdb` binary
  * re-expressed over the engine API (driftdb-cli/src/main.rs:27-101):
  *
  *   graft init <dir>
  *   graft sql -d <dir> [-e "<SQL>"] [-f <file.sql>]      # no -e/-f: REPL
  *   graft ingest -d <dir> -t <table> -f <file.jsonl>
  *   graft select -d <dir> -t <table> [-w <cond>] [--as-of <@SEQ:n|ts>]
  *                [-l <n>] [--json]
  *   graft drift -d <dir> -t <table> -k <pk>
  *   graft snapshot -d <dir> -t <table>
  *   graft compact -d <dir> -t <table>
  *   graft analyze -d <dir> [-t <table>]
  *   graft doctor -d <dir>
  *   graft backup -d <dir> <to|restore|verify> <path>
  *
  * Every subcommand maps onto the same statements a SQL session would
  * run (`engine.sql`), so the CLI adds no second execution path to
  * keep correct — `sql` IS the engine's entry point, and the typed
  * subcommands are convenience spellings (ingest → COPY FROM, drift →
  * FOR SYSTEM_TIME ALL, compact → SNAPSHOT, backup → BACKUP/RESTORE/
  * VERIFY). The command core is side-effect-parameterized (out/err
  * writers, injectable stdin) so CliSpec drives it end-to-end without
  * a subprocess.
  */
object Cli {

  final case class ExitException(code: Int) extends RuntimeException

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(2, Runtime.getRuntime.availableProcessors() / 2).toString)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val code =
      try run(args.toSeq, spark, Console.out.println(_), Console.err.println(_),
        () => scala.io.Source.stdin.getLines())
      finally spark.stop()
    if (code != 0) sys.exit(code)
  }

  /** The testable command core: parses `args`, runs the command, and
    * returns a process exit code. `stdin` supplies REPL lines. */
  def run(args: Seq[String], spark: SparkSession,
      out: String => Unit, err: String => Unit,
      stdin: () => Iterator[String] = () => Iterator.empty): Int =
    try {
      args.toList match {
        case "init" :: dir :: Nil =>
          new QueryEngine(spark, dir).close()
          out(s"initialized graft database at $dir"); 0
        case "sql" :: rest =>
          val o = opts(rest)
          withEngine(spark, o) { e =>
            (o.get("e"), o.get("f")) match {
              case (Some(stmt), _) => runScript(e, stmt, out)
              case (None, Some(file)) =>
                runScript(e, java.nio.file.Files.readString(
                  java.nio.file.Paths.get(file)), out)
              case (None, None) => repl(e, out, err, stdin())
            }
          }
        case "ingest" :: rest =>
          val o = opts(rest)
          withEngine(spark, o) { e =>
            val fmt = o.get("format").fold("")(f => s" (FORMAT $f)")
            show(e.sql(s"COPY ${req(o, "t")} FROM '${req(o, "f")}'$fmt"), out); 0
          }
        case "select" :: rest =>
          val o = opts(rest)
          withEngine(spark, o) { e =>
            val asOf = o.get("as-of").fold("")(v => s" FOR SYSTEM_TIME AS OF " +
              (if (v.startsWith("@")) v else s"'$v'"))
            val where = o.get("w").fold("")(c => s" WHERE $c")
            val limit = o.get("l").fold("")(n => s" LIMIT ${n.toLong}")
            val df = e.sql(s"SELECT * FROM ${req(o, "t")}$asOf$where$limit")
            if (o.contains("json")) df.toJSON.collect().foreach(out)
            else show(df, out)
            0
          }
        case "drift" :: rest =>
          val o = opts(rest)
          withEngine(spark, o) { e =>
            val t = req(o, "t")
            val pk = e.catalog.require(t).pk
            show(e.sql(s"SELECT * FROM $t FOR SYSTEM_TIME ALL " +
              s"WHERE $pk = ${sqlLiteral(req(o, "k"))} ORDER BY sequence"), out)
            0
          }
        case "snapshot" :: rest =>
          val o = opts(rest)
          withEngine(spark, o)(e => { show(e.sql(s"SNAPSHOT ${req(o, "t")}"), out); 0 })
        case "compact" :: rest =>
          // the reference's compact = snapshot + segment reclaim; ours
          // snapshots (reclaim is VACUUM RETAIN, an explicit decision)
          val o = opts(rest)
          withEngine(spark, o)(e => { show(e.sql(s"SNAPSHOT ${req(o, "t")}"), out); 0 })
        case "optimize" :: rest =>
          // layout clustering: graft optimize -d dir -t t [-z c1,c2]
          val o = opts(rest)
          withEngine(spark, o) { e =>
            val z = o.get("z").map(cols => s" ZORDER BY ($cols)").getOrElse("")
            show(e.sql(s"OPTIMIZE ${req(o, "t")}$z"), out); 0
          }
        case "analyze" :: rest =>
          val o = opts(rest)
          withEngine(spark, o) { e =>
            val tables = o.get("t").map(Seq(_)).getOrElse(e.catalog.tableNames)
            tables.foreach(t => show(e.sql(s"ANALYZE $t"), out)); 0
          }
        case "status" :: rest =>
          // one-screen admin overview (the reference admin tool's
          // show_status, driftdb-admin/src/main.rs:292-370): health
          // facts, per-table storage footprint, engine counters, and
          // any firing alerts
          val o = opts(rest)
          withEngine(spark, o) { e =>
            out("== health ==")
            e.healthSnapshot.toSeq.sortBy(_._1)
              .foreach { case (k, v) => out(s"$k|$v") }
            out("== storage ==")
            show(e.sql("SHOW STORAGE"), out)
            out("== metrics ==")
            show(e.sql("SHOW METRICS"), out)
            out("== alerts ==")
            show(e.sql("SHOW ALERTS"), out)
            0
          }
        case "trace" :: rest =>
          // run one statement with span recording on and print its
          // phase breakdown — the wall-clock complement to EXPLAIN
          // ANALYZE (observability.rs span instrumentation; SET TRACE
          // ON / SHOW TRACE are the SQL surface this drives)
          val o = opts(rest)
          withEngine(spark, o) { e =>
            e.sql("SET TRACE ON")
            val stmt = req(o, "e")
            // a failed statement still records an ok=false trace worth
            // printing, but the verb must exit nonzero so scripts see
            // the failure (mirrors the `sql` verb's error contract)
            var failed = false
            try show(e.sql(stmt), out)
            catch {
              case ex: Exception =>
                failed = true
                err(s"statement failed: ${ex.getMessage}")
            }
            val traces = e.sql("SHOW TRACES").collect()
            // the ring stores statements truncated to 500 chars
            traces.find(_.getString(1) == stmt.take(500)) match {
              case Some(tr) =>
                out(f"total ${tr.getDouble(2)}%.1f ms")
                show(e.sql(s"SHOW TRACE ${tr.getLong(0)}"), out)
                if (failed) 1 else 0
              case None => err("no trace recorded"); 1
            }
          }
        case "monitor" :: rest =>
          // periodic metrics watch (the reference admin tool's monitor
          // loop, driftdb-admin/src/main.rs:372-436): engine counters +
          // the wall-clock latency summary every interval, -n ticks
          // (0 = forever), -i seconds between ticks
          val o = opts(rest)
          val ticks = o.kv.getOrElse("n", "0").toInt
          val intervalMs = (o.kv.getOrElse("i", "5").toDouble * 1000).toLong
          withEngine(spark, o) { e =>
            var i = 0
            while (ticks == 0 || i < ticks) {
              if (i > 0 && intervalMs > 0) Thread.sleep(intervalMs)
              out(s"== tick $i ==")
              show(e.sql("SHOW METRICS"), out)
              show(e.sql("SHOW PERF").where("kind = 'summary'"), out)
              i += 1
            }
            0
          }
        case "doctor" :: rest =>
          val o = opts(rest)
          withEngine(spark, o) { e =>
            // integrity pass per table: current state must scan, the
            // surviving event range must scan, and the sequence counter
            // must cover the log (a counter BEHIND the log would assign
            // duplicate sequences on the next write — the exact
            // corruption the reference's doctor hunts, main.rs Doctor)
            val bad = e.catalog.tableNames.filter { t =>
              try {
                // artifact-level audit FIRST: per-file readability,
                // sequence continuity, checkpoint integrity (CHECK
                // TABLE) — a failing row names the corrupt file for
                // REPAIR TABLE, which a raw read error cannot.
                // Attached in-memory logs have no files to audit.
                val findings =
                  if (e.catalog.get(t).exists(_.attached.isDefined))
                    Array.empty[org.apache.spark.sql.Row]
                  else e.sql(s"CHECK TABLE $t").collect()
                    .filter(r => r.getString(2) != "OK")
                for (f <- findings)
                  err(s"$t: ${f.getString(0)} ${f.getString(1)} " +
                    s"${f.getString(2)} — ${f.getString(3)}")
                if (findings.nonEmpty)
                  throw new IllegalStateException(
                    s"${findings.length} CHECK finding(s) — run REPAIR TABLE $t")
                e.sql(s"SELECT COUNT(*) FROM $t").collect()
                val floor = e.catalog.retentionFloor(t)
                val last = e.catalog.lastSeq(t)
                if (last > floor) {
                  // upper bound far past the counter so a log that ran
                  // AHEAD of the counter is visible to the check
                  val mx = e.sql(
                    s"SELECT MAX(sequence) AS m FROM $t FOR SYSTEM_TIME BETWEEN ${floor + 1} AND ${Long.MaxValue}")
                    .collect()(0)
                  if (!mx.isNullAt(0) && mx.getLong(0) > last)
                    throw new IllegalStateException(
                      s"sequence counter $last behind log max ${mx.getLong(0)}")
                }
                out(s"$t: ok (seq $last, floor $floor)")
                false
              } catch { case ex: Exception => err(s"$t: ${ex.getMessage}"); true }
            }
            // advisory tail: the same engine-derived suggestions the
            // /performance/optimization endpoint serves — a healthy
            // store can still be a slow one
            for ((cat, pri, text) <- e.optimizationSuggestions()
                if pri != "low")
              out(s"advice [$cat/$pri]: $text")
            out(if (bad.isEmpty) "ok" else s"corrupt tables: ${bad.mkString(", ")}")
            if (bad.isEmpty) 0 else 1
          }
        case "export" :: rest =>
          // COPY ... TO — table or full query result to sharded files
          val o = opts(rest)
          withEngine(spark, o) { e =>
            val src = o.get("q").map(q => s"($q)").getOrElse(req(o, "t"))
            val fmt = o.get("format").fold("")(f => s" (FORMAT $f)")
            show(e.sql(s"COPY $src TO '${req(o, "f")}'$fmt"), out); 0
          }
        case "serve" :: rest =>
          // PostgreSQL wire protocol — `psql -h ... -p <port>` connects
          // directly (session/mod.rs:137-241). Secure by default:
          // loopback bind and plain non-superuser sessions; `--trust
          // root` grants superuser to named users, `-b 0.0.0.0`
          // exposes the listener beyond the machine — both explicit.
          val o = opts(rest)
          val e = new QueryEngine(spark, req(o, "d"))
          val srv = new graft.server.PgServer(e,
            o.get("p").map(_.toInt).getOrElse(5433),
            bind = o.get("b").getOrElse("127.0.0.1"),
            superusers = o.get("trust").toSeq
              .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).toSet).start()
          out(s"listening on ${srv.boundPort} (PostgreSQL wire protocol; Ctrl-D stops)")
          // optional observability sidecar: /health + /metrics +
          // /performance (wire-pool stats come from the live server)
          val http = o.get("http-port").map(p =>
            new graft.server.HttpAdmin(e, p.toInt,
              bind = o.get("b").getOrElse("127.0.0.1"),
              connStats = Some(() => srv.poolTelemetry)).start())
          http.foreach(h => out(s"http health/metrics on ${h.boundPort}"))
          try { stdin().foreach(_ => ()); 0 }
          finally { http.foreach(_.close()); srv.close(); e.close() }
        case "backup" :: rest =>
          val o = opts(rest)
          o.rest match {
            case verb :: path :: Nil =>
              val stmt = verb match {
                case "to" | "create" => s"BACKUP DATABASE TO '$path'"
                case "restore" => s"RESTORE DATABASE FROM '$path'"
                case "verify" => s"VERIFY BACKUP '$path'"
                case other => throw new IllegalArgumentException(
                  s"unknown backup verb: $other (to|restore|verify)")
              }
              withEngine(spark, o)(e => { show(e.sql(stmt), out); 0 })
            case _ =>
              throw new IllegalArgumentException("usage: backup -d <dir> <to|restore|verify> <path>")
          }
        case cmd :: _ =>
          err(s"unknown command: $cmd"); err(usage); 2
        case Nil =>
          err(usage); 2
      }
    } catch {
      case ExitException(code) => code
      case e: Exception => err(s"error: ${e.getMessage}"); 1
    }

  private val usage =
    """usage: graft <init|sql|ingest|export|select|drift|snapshot|compact|optimize|analyze|doctor|status|monitor|trace|backup|serve> [options]
      |  -d <dir>   database directory (required except init)
      |  sql: -e "<SQL>" | -f <file.sql> | (stdin REPL)
      |  trace: -e "<SQL>"   (run with span recording, print the phase tree)
      |  ingest: -t <table> -f <file> [--format jsonl|parquet|csv]
      |  export: (-t <table> | -q "<SQL>") -f <dir> [--format ...]
      |  select: -t <table> [-w <cond>] [--as-of <@SEQ:n|ts>] [-l n] [--json]
      |  drift: -t <table> -k <pk>
      |  backup: <to|restore|verify> <path>
      |  serve: [-p <port>] [-b <bind-addr>] [--trust u1,u2] [--http-port <port>]   (PostgreSQL wire protocol + HTTP health/metrics)""".stripMargin

  /** getopt-lite: `-x v` / `--long v` pairs plus bare flags (--json)
    * and positional leftovers. */
  private final case class Opts(kv: Map[String, String], flags: Set[String],
      rest: List[String]) {
    def get(k: String): Option[String] = kv.get(k)
    def contains(k: String): Boolean = flags(k) || kv.contains(k)
  }
  private val BareFlags = Set("json")
  private def opts(args: List[String]): Opts = {
    @annotation.tailrec
    def loop(as: List[String], kv: Map[String, String], flags: Set[String],
        rest: List[String]): Opts = as match {
      case f :: tail if f.startsWith("-") && BareFlags(f.dropWhile(_ == '-')) =>
        loop(tail, kv, flags + f.dropWhile(_ == '-'), rest)
      case k :: v :: tail if k.startsWith("-") =>
        loop(tail, kv + (k.dropWhile(_ == '-') -> v), flags, rest)
      case k :: Nil if k.startsWith("-") =>
        throw new IllegalArgumentException(s"option $k needs a value")
      case x :: tail => loop(tail, kv, flags, rest :+ x)
      case Nil => Opts(kv, flags, rest)
    }
    // long-option aliases fold onto the short names the dispatch uses
    val alias = Map("data" -> "d", "execute" -> "e", "file" -> "f",
      "table" -> "t", "where" -> "w", "limit" -> "l", "key" -> "k",
      "zorder" -> "z")
    val o = loop(args, Map.empty, Set.empty, Nil)
    o.copy(kv = o.kv.map { case (k, v) => (alias.getOrElse(k, k), v) })
  }

  private def req(o: Opts, k: String): String = o.get(k).getOrElse(
    throw new IllegalArgumentException(s"missing required option -$k"))

  private def withEngine(spark: SparkSession, o: Opts)(body: QueryEngine => Int): Int = {
    val e = new QueryEngine(spark, req(o, "d"))
    try body(e) finally e.close()
  }

  /** Split on semicolons at code positions (not inside quotes/comments)
    * and run each statement, printing every result. */
  private def runScript(e: QueryEngine, script: String, out: String => Unit): Int = {
    val stmts = graft.sql.StatementRouter.splitTopLevel(script, ';')
      .filter(s => graft.sql.SqlText.maskNonCode(s).trim.nonEmpty)
    for (stmt <- stmts) show(e.sql(stmt), out)
    0
  }

  private def repl(e: QueryEngine, out: String => Unit, err: String => Unit,
      lines: Iterator[String]): Int = {
    out("graft SQL — end statements with ';', \\q quits")
    val buf = new StringBuilder
    for (line <- lines) {
      val t = line.trim
      if (t == "\\q" || t == "exit" || t == "quit") return 0
      buf.append(line).append('\n')
      if (t.endsWith(";")) {
        val script = buf.toString; buf.clear()
        try runScript(e, script, out)
        catch { case ex: Exception => err(s"error: ${ex.getMessage}") }
      }
    }
    // a trailing unterminated statement still runs (piped scripts)
    if (buf.toString.trim.nonEmpty)
      try runScript(e, buf.toString, out)
      catch { case ex: Exception => err(s"error: ${ex.getMessage}"); return 1 }
    0
  }

  /** A `pk = <value>` literal: numeric stays bare, anything else quotes. */
  private def sqlLiteral(v: String): String =
    if (v.matches("""-?\d+(\.\d+)?""")) v
    else "'" + v.replace("'", "''") + "'"

  /** Aligned text table, psql-ish; NULL prints as ∅ to distinguish from
    * the string "null". */
  private def show(df: DataFrame, out: String => Unit): Unit = {
    val cols = df.columns
    val rows = df.limit(10001).collect()
    val cells = rows.map(_.toSeq.map(v => if (v == null) "∅" else v.toString))
    val widths = cols.indices.map(i =>
      (cols(i).length +: cells.map(_(i).length)).max)
    def line(vs: Seq[String]) =
      vs.zip(widths).map { case (v, w) => v.padTo(w, ' ') }.mkString(" | ")
    out(line(cols.toSeq))
    out(widths.map("-" * _).mkString("-+-"))
    cells.take(10000).foreach(r => out(line(r)))
    if (rows.length > 10000) out("... (truncated at 10000 rows)")
    out(s"(${math.min(rows.length, 10000)} rows)")
  }
}
