package graft.server

import graft.TestSpark
import graft.exec.QueryEngine
import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._

/** psql (the real binary) against the wire server: startup handshake
  * (incl. SSL negotiation), CREATE/INSERT/SELECT round trip, temporal
  * SQL, multi-row output, NULLs, errors as ErrorResponse with a
  * nonzero exit, and session isolation between connections.
  */
class PgServerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def withServer(body: (QueryEngine, Int) => Unit): Unit = {
    val e = QueryEngine.scratch(spark)
    val srv = new PgServer(e, 0).start()
    try body(e, srv.boundPort) finally { srv.close(); e.close() }
  }

  /** Run psql -c, returning (exitCode, stdout, stderr). */
  private def psql(port: Int, sql: String): (Int, String, String) = {
    val outB = new StringBuilder
    val errB = new StringBuilder
    val code = Seq("psql", "-h", "127.0.0.1", "-p", port.toString,
        "-d", "graft", "-U", "root", "-X", "-A", "-t", "-c", sql)
      .!(ProcessLogger(outB.append(_).append('\n'), errB.append(_).append('\n')))
    (code, outB.toString, errB.toString)
  }

  test("psql CREATE / INSERT / SELECT round trip") {
    withServer { (_, port) =>
      val (c1, _, e1) =
        psql(port, "CREATE TABLE t (k BIGINT PRIMARY KEY, v STRING)")
      assert(c1 === 0, s"create failed: $e1")
      assert(psql(port, "INSERT INTO t VALUES (1, 'a'), (2, 'b'), (3, NULL)")._1 === 0)
      val (c2, out, _) = psql(port, "SELECT k, v FROM t ORDER BY k")
      assert(c2 === 0)
      assert(out.linesIterator.toSeq.filter(_.nonEmpty)
        === Seq("1|a", "2|b", "3|"))
      // temporal SQL over the wire
      val (c3, asOf, _) =
        psql(port, "SELECT COUNT(*) AS n FROM t FOR SYSTEM_TIME AS OF @SEQ:3")
      assert(c3 === 0 && asOf.trim === "3")
    }
  }

  test("multi-statement -c, errors exit nonzero, sessions are isolated") {
    withServer { (_, port) =>
      // one Query message carrying several statements
      val (c1, out, _) = psql(port,
        "CREATE TABLE s (k BIGINT PRIMARY KEY); INSERT INTO s VALUES (7); SELECT k FROM s")
      assert(c1 === 0 && out.linesIterator.exists(_.trim == "7"))
      // an engine error surfaces as ErrorResponse -> psql exits 1
      val (c2, _, err) = psql(port, "SELECT * FROM no_such_table")
      assert(c2 != 0 && err.toLowerCase.contains("error"))
      // and the connection-level BEGIN of one psql run never leaks into
      // the next (each connection is its own session; psql -c closes)
      assert(psql(port, "BEGIN; INSERT INTO s VALUES (8)")._1 === 0) // never committed
      val (c3, out3, _) = psql(port, "SELECT COUNT(*) AS n FROM s")
      assert(c3 === 0 && out3.trim === "1")
    }
  }
}
