package graft

import org.scalatest.funsuite.AnyFunSuite

/** The CLI entry point (driftdb-cli main.rs:27-101): every subcommand
  * drives the same `run` core `main` does, with captured output — a
  * shell user's CREATE/INSERT/SELECT/AS-OF round trip, scripts, REPL
  * input, JSONL ingest, drift history, and error exit codes.
  */
class CliSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-cli-").toString

  /** Run a CLI invocation, capturing stdout lines and the exit code. */
  private def cli(args: String*): (Int, Seq[String], Seq[String]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val err = scala.collection.mutable.ArrayBuffer.empty[String]
    val code = Cli.run(args.toSeq, spark, out += _, err += _)
    (code, out.toSeq, err.toSeq)
  }

  test("init + sql -e: CREATE / INSERT / SELECT round trip through the jar entry") {
    val dir = freshDir()
    assert(cli("init", dir)._1 === 0)
    assert(cli("sql", "-d", dir,
      "-e", "CREATE TABLE t (k BIGINT PRIMARY KEY, v STRING)")._1 === 0)
    assert(cli("sql", "-d", dir,
      "-e", "INSERT INTO t VALUES (1, 'a'), (2, 'b'); INSERT INTO t VALUES (3, 'c')")._1 === 0)
    val (code, out, _) = cli("sql", "-d", dir, "-e", "SELECT k, v FROM t ORDER BY k")
    assert(code === 0)
    assert(out.exists(_.matches("""k\s+\|\s+v\s*""")), s"header missing in $out")
    assert(out.count(_.matches("""\d+\s*\|\s*\w\s*""")) === 3)
    assert(out.last === "(3 rows)")
  }

  test("select subcommand with WHERE / AS OF / LIMIT / --json") {
    val dir = freshDir()
    cli("sql", "-d", dir, "-e",
      """CREATE TABLE acct (k BIGINT PRIMARY KEY, bal DOUBLE);
        |INSERT INTO acct VALUES (1, 10.0), (2, 20.0), (3, 30.0);
        |UPDATE acct SET bal = 99.0 WHERE k = 1""".stripMargin)
    val (c1, out1, _) = cli("select", "-d", dir, "-t", "acct", "-w", "bal > 15", "--json")
    assert(c1 === 0)
    val jsons = out1.filter(_.startsWith("{"))
    assert(jsons.size === 3 && jsons.exists(_.contains("\"bal\":99.0")))
    // AS OF the post-insert boundary: the update is not visible yet
    val (c2, out2, _) = cli("select", "-d", dir, "-t", "acct",
      "--as-of", "@SEQ:3", "-w", "k = 1", "--json")
    assert(c2 === 0 && out2.exists(_.contains("\"bal\":10.0")))
    val (c3, out3, _) = cli("select", "-d", dir, "-t", "acct", "-l", "2")
    assert(c3 === 0 && out3.last === "(2 rows)")
  }

  test("ingest reads JSONL (COPY FROM path); drift shows a key's history") {
    val dir = freshDir()
    cli("sql", "-d", dir, "-e",
      "CREATE TABLE ev (id BIGINT PRIMARY KEY, name STRING)")
    val f = java.nio.file.Files.createTempFile("graft-cli-ingest", ".jsonl")
    java.nio.file.Files.writeString(f,
      """{"id": 1, "name": "x"}
        |{"id": 2, "name": "y"}
        |""".stripMargin)
    assert(cli("ingest", "-d", dir, "-t", "ev", "-f", f.toString)._1 === 0)
    cli("sql", "-d", dir, "-e", "UPDATE ev SET name = 'z' WHERE id = 1")
    val (code, out, _) = cli("drift", "-d", dir, "-t", "ev", "-k", "1")
    assert(code === 0)
    // id=1 has its INSERT and its PATCH, in sequence order
    assert(out.exists(_.contains("INSERT")) && out.exists(_.contains("PATCH")))
    assert(out.last === "(2 rows)")
  }

  test("COPY ingests parquet and CSV by extension or explicit FORMAT") {
    val dir = freshDir()
    cli("sql", "-d", dir, "-e",
      "CREATE TABLE m (k BIGINT PRIMARY KEY, v STRING, x DOUBLE)")
    // parquet: written by Spark itself, ingested back by extension
    val pq = java.nio.file.Files.createTempDirectory("graft-copy-pq")
      .resolve("rows.parquet").toString
    val (c0, _, _) = cli("sql", "-d", dir, "-e", "SELECT 1") // warm engine dir
    assert(c0 === 0)
    locally {
      val spark = TestSpark.spark
      import spark.implicits._
      Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("k", "v", "x")
        .coalesce(1).write.parquet(pq)
    }
    assert(cli("sql", "-d", dir, "-e", s"COPY m FROM '$pq'")._1 === 0)
    // CSV with header: all-string read casts up to the declared types
    val csv = java.nio.file.Files.createTempFile("graft-copy", ".csv")
    java.nio.file.Files.writeString(csv, "k,v,x\n3,c,3.5\n4,d,\n")
    assert(cli("sql", "-d", dir, "-e",
      s"COPY m FROM '${csv.toString}' (FORMAT CSV)")._1 === 0)
    val (code, out, _) = cli("select", "-d", dir, "-t", "m", "--json")
    assert(code === 0)
    val rows = out.filter(_.startsWith("{"))
    assert(rows.size === 4)
    assert(rows.exists(r => r.contains("\"k\":3") && r.contains("\"x\":3.5")))
    assert(rows.exists(r => r.contains("\"k\":4") && !r.contains("\"x\"")))
    // unknown format is rejected
    assert(cli("sql", "-d", dir, "-e",
      s"COPY m FROM '${csv.toString}' (FORMAT XML)")._1 === 1)
  }

  test("COPY TO exports a table or query; round-trips through COPY FROM; RLS filters exports") {
    val dir = freshDir()
    cli("sql", "-d", dir, "-e",
      """CREATE TABLE src (k BIGINT PRIMARY KEY, owner STRING, x DOUBLE);
        |INSERT INTO src VALUES (1, 'alice', 1.5), (2, 'bob', 2.5), (3, 'alice', 3.5)""".stripMargin)
    val outDir = freshDir()
    // query export as parquet, re-ingested into a second table
    assert(cli("export", "-d", dir, "-q",
      "SELECT k, owner, x FROM src WHERE x > 2", "-f", s"$outDir/hi.parquet")._1 === 0)
    cli("sql", "-d", dir, "-e",
      "CREATE TABLE back (k BIGINT PRIMARY KEY, owner STRING, x DOUBLE)")
    assert(cli("sql", "-d", dir, "-e",
      s"COPY back FROM '$outDir/hi.parquet'")._1 === 0)
    val (c1, out1, _) = cli("select", "-d", dir, "-t", "back", "--json")
    assert(c1 === 0 && out1.count(_.startsWith("{")) === 2)
    // the export read is governed: an RLS-restricted session exports
    // only its visible rows
    locally {
      val e = new graft.exec.QueryEngine(TestSpark.spark, dir)
      e.sql("ALTER TABLE src ENABLE ROW LEVEL SECURITY")
      e.sql("CREATE POLICY own ON src FOR SELECT USING (owner = current_user)")
      val alice = e.newSession(); alice.setAuth("alice")
      alice.sql(s"COPY src TO '$outDir/alice.jsonl' (FORMAT JSONL)")
      e.close()
      val lines = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$outDir/alice.jsonl"))
        .filter(p => p.getFileName.toString.startsWith("part-"))
        .map[Long](p => java.nio.file.Files.readAllLines(p).stream().count())
        .reduce(0L, (a, b) => a + b)
      assert(lines === 2L, s"RLS leak: exported $lines rows")
    }
  }

  test("sql -f runs a script file; REPL consumes stdin statements") {
    val dir = freshDir()
    val script = java.nio.file.Files.createTempFile("graft-cli-script", ".sql")
    java.nio.file.Files.writeString(script,
      """CREATE TABLE s (k BIGINT PRIMARY KEY);
        |INSERT INTO s VALUES (1), (2);
        |-- a comment-only tail must not break the run
        |""".stripMargin)
    assert(cli("sql", "-d", dir, "-f", script.toString)._1 === 0)
    val replIn = Iterator("SELECT COUNT(*) AS n FROM s;", "\\q")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val code = Cli.run(Seq("sql", "-d", dir), spark, out += _, _ => (), () => replIn)
    assert(code === 0)
    assert(out.exists(_.startsWith("2")), s"REPL output missing count: $out")
  }

  test("snapshot / analyze / doctor / backup verbs succeed; errors exit nonzero") {
    val dir = freshDir()
    cli("sql", "-d", dir, "-e",
      "CREATE TABLE t (k BIGINT PRIMARY KEY); INSERT INTO t VALUES (1)")
    assert(cli("snapshot", "-d", dir, "-t", "t")._1 === 0)
    assert(cli("optimize", "-d", dir, "-t", "t", "-z", "k")._1 === 0)
    assert(cli("optimize", "-d", dir, "-t", "nope")._1 === 1)
    assert(cli("analyze", "-d", dir)._1 === 0)
    val (dc, dout, _) = cli("doctor", "-d", dir)
    assert(dc === 0 && dout.contains("ok"))
    val bdir = freshDir() + "/b1"
    assert(cli("backup", "-d", dir, "to", bdir)._1 === 0)
    assert(cli("backup", "-d", dir, "verify", bdir)._1 === 0)
    cli("sql", "-d", dir, "-e", "DELETE FROM t")
    assert(cli("backup", "-d", dir, "restore", bdir)._1 === 0)
    val (_, out, _) = cli("select", "-d", dir, "-t", "t", "--json")
    assert(out.count(_.startsWith("{")) === 1) // the restored row
    // failure paths: bad SQL and unknown command exit nonzero
    assert(cli("sql", "-d", dir, "-e", "SELEKT nonsense")._1 === 1)
    assert(cli("frobnicate")._1 === 2)
    assert(cli("sql", "-d", dir, "-e")._1 === 1) // dangling option
  }

  test("doctor flags a corrupt log file and repair heals it") {
    val dir = freshDir()
    cli("sql", "-d", dir, "-e",
      """CREATE TABLE t (k BIGINT PRIMARY KEY);
        |INSERT INTO t VALUES (1); INSERT INTO t VALUES (2)""".stripMargin)
    // truncate the second batch's file mid-byte
    val logDir = java.nio.file.Paths.get(dir, "tables", "t", "log")
    val files = scala.jdk.CollectionConverters
      .IteratorHasAsScala(java.nio.file.Files.list(logDir).iterator()).asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq
    val victim = files.maxBy(f =>
      spark.read.parquet(f.toString)
        .agg(org.apache.spark.sql.functions.max("sequence")).head().getLong(0))
    val bytes = java.nio.file.Files.readAllBytes(victim)
    java.nio.file.Files.write(victim, bytes.take(bytes.length / 2))
    val (dc, _, derr) = cli("doctor", "-d", dir)
    assert(dc === 1, derr)
    assert(derr.exists(_.contains("CHECK finding")), derr)
    // repair through the SQL verb, then doctor is healthy again
    assert(cli("sql", "-d", dir, "-e", "REPAIR TABLE t")._1 === 0)
    val (dc2, dout2, _) = cli("doctor", "-d", dir)
    assert(dc2 === 0, dout2)
  }

  test("status gives the one-screen admin overview") {
    val dir = freshDir()
    cli("sql", "-d", dir, "-e",
      "CREATE TABLE t (k BIGINT PRIMARY KEY); INSERT INTO t VALUES (1); " +
        "CREATE ALERT busy ON statements_total > 1")
    val (c, out, _) = cli("status", "-d", dir)
    assert(c === 0, out)
    val joined = out.mkString("\n")
    assert(joined.contains("== health ==") && joined.contains("status|ok"), joined)
    assert(joined.contains("== storage ==") && joined.contains("log_files"), joined)
    assert(joined.contains("== metrics ==") &&
      joined.contains("statements_total"), joined)
    assert(joined.contains("== alerts ==") && joined.contains("FIRING"), joined)
  }

  test("trace runs one statement with span recording and prints the tree") {
    val dir = freshDir()
    cli("sql", "-d", dir, "-e",
      "CREATE TABLE t (k BIGINT PRIMARY KEY, v STRING)")
    val (c, out, _) = cli("trace", "-d", dir, "-e",
      "INSERT INTO t VALUES (1, 'a')")
    assert(c === 0, out)
    val joined = out.mkString("\n")
    assert(joined.contains("total ") && joined.contains("ms"), joined)
    assert(joined.contains("statement") && joined.contains("publish"), joined)
    // a broken statement MUST exit nonzero (scripts detect the failure
    // from the exit code; ADVICE r13), while any recorded ok=false
    // trace still prints
    val (c2, _, err2) = cli("trace", "-d", dir, "-e", "INSERT INTO nope VALUES (1)")
    assert(c2 === 1, err2)
    assert(err2.mkString.contains("statement failed") ||
      err2.mkString.contains("error"), err2)
    // a statement longer than the ring's 500-char truncation still
    // finds its own trace (regression: exact-match against the
    // truncated text reported 'no trace recorded')
    val wide = (2 to 120).map(i => s"($i, 'v$i')").mkString(", ")
    val (c3, out3, _) = cli("trace", "-d", dir, "-e",
      s"INSERT INTO t VALUES $wide")
    assert(c3 === 0, out3)
    assert(out3.mkString("\n").contains("publish"), out3)
  }

  test("monitor ticks the metrics watch n times and exits") {
    val dir = freshDir()
    cli("sql", "-d", dir, "-e",
      "CREATE TABLE t (k BIGINT PRIMARY KEY); INSERT INTO t VALUES (1)")
    val (c, out, _) = cli("monitor", "-d", dir, "-n", "2", "-i", "0")
    assert(c === 0, out)
    val joined = out.mkString("\n")
    assert(joined.contains("== tick 0 ==") && joined.contains("== tick 1 =="), joined)
    assert(!joined.contains("== tick 2 =="), joined)
    assert(joined.contains("statements_total"), joined)
    assert(joined.contains("p95_ms"), joined)
  }
}
