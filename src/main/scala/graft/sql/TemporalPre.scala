package graft.sql

/** SQL:2011 temporal clause, resolved before parsing.
  *
  * Mirrors the reference's approach exactly (sql_bridge.rs:304-320,
  * 47-78): `FOR SYSTEM_TIME ...` is extracted at STRING level before
  * the statement reaches the SQL parser (sqlparser there, Catalyst
  * here — neither accepts the clause), and the extracted spec applies
  * to every event-sourced table referenced by the statement.
  */
sealed trait SystemTime
object SystemTime {
  case object Current extends SystemTime
  final case class AsOfSeq(seq: Long) extends SystemTime
  final case class AsOfTs(ts: String) extends SystemTime
  case object All extends SystemTime
  final case class Between(from: Long, to: Long) extends SystemTime
}

object TemporalPre {
  private val AsOfSeqR = """(?i)FOR\s+SYSTEM_TIME\s+AS\s+OF\s+@SEQ:(\d+)""".r
  private val AsOfTsR = """(?i)FOR\s+SYSTEM_TIME\s+AS\s+OF\s+'([^']+)'""".r
  private val AllR = """(?i)FOR\s+SYSTEM_TIME\s+ALL""".r
  private val BetweenR = """(?i)FOR\s+SYSTEM_TIME\s+BETWEEN\s+(\d+)\s+AND\s+(\d+)""".r
  private val FromToR = """(?i)FOR\s+SYSTEM_TIME\s+FROM\s+(\d+)\s+TO\s+(\d+)""".r

  /** Extract the temporal clause (first match wins, every occurrence is
    * stripped) and return the cleaned SQL plus the spec. BETWEEN and
    * FROM..TO are sequence ranges — a superset of the reference, which
    * parses them but errors (README.md:94-96).
    *
    * Only matches that START at a code position count: the words
    * "FOR SYSTEM_TIME ALL" inside a string literal or comment are
    * data, not a temporal spec (graft.sql.SqlText decides what is
    * code), and stripping must not rewrite literal content. */
  def extract(sql: String): (String, SystemTime) = {
    lazy val code = SqlText.codeMask(sql)
    def attempt(r: scala.util.matching.Regex)(
        mk: scala.util.matching.Regex.Match => SystemTime): Option[(String, SystemTime)] = {
      val ms = r.findAllMatchIn(sql).filter(m => code(m.start)).toList
      ms.headOption.map { first =>
        val sb = new StringBuilder(sql)
        for (m <- ms; i <- m.start until m.end) sb.setCharAt(i, ' ')
        (sb.toString, mk(first))
      }
    }
    attempt(AsOfSeqR)(m => SystemTime.AsOfSeq(m.group(1).toLong))
      .orElse(attempt(AsOfTsR)(m => SystemTime.AsOfTs(m.group(1))))
      .orElse(attempt(BetweenR)(m =>
        SystemTime.Between(m.group(1).toLong, m.group(2).toLong)))
      .orElse(attempt(FromToR)(m =>
        SystemTime.Between(m.group(1).toLong, m.group(2).toLong)))
      .orElse(attempt(AllR)(_ => SystemTime.All))
      .getOrElse((sql, SystemTime.Current))
  }
}
