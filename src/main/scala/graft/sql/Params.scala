package graft.sql

/** `$1 $2 ...` parameter binding for engine statements — the analogue
  * of the reference's `execute_sql_with_params` (sql_bridge.rs:183-226),
  * which binds a JSON param array into the statement before execution.
  * Binding happens at the statement-string level (values render as SQL
  * literals with proper quoting), so every statement kind the router
  * understands is parameterizable — a superset of the reference, which
  * supports only SELECT and CREATE TABLE with params.
  */
object Params {

  /** Replace each `$N` placeholder outside string literals and
    * comments with the rendered `params(N-1)`. Placeholders inside
    * literals or comments are left alone, as a SQL parser would; the
    * shared SqlText classifier decides what is code, so quoting rules
    * (both quote chars, `''` doubling, backslash escapes) and comment
    * forms match the rest of the engine exactly. */
  def bind(sql: String, params: Seq[Any]): String = {
    if (SqlText.endsInsideString(sql))
      throw new IllegalArgumentException("unterminated string literal")
    if (SqlText.endsInsideIdentifier(sql))
      throw new IllegalArgumentException("unterminated backtick identifier")
    val code = SqlText.codeMask(sql)
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (code(i) && c == '$' && i + 1 < sql.length && sql.charAt(i + 1).isDigit) {
        var j = i + 1
        while (j < sql.length && sql.charAt(j).isDigit) j += 1
        val n = sql.substring(i + 1, j).toInt
        if (n < 1 || n > params.length)
          throw new IllegalArgumentException(
            s"parameter $$$n out of range (${params.length} provided)")
        out ++= render(params(n - 1))
        i = j
      } else { out += c; i += 1 }
    }
    out.toString
  }

  /** Named binding for procedure bodies: `$param` (or positional `$N`)
    * outside string literals and comments becomes the matching
    * pre-rendered literal. Names resolve case-insensitively, like
    * unquoted SQL identifiers; an unresolvable `$ident` at a code
    * position raises — in a procedure body it can only be a typo, and
    * silently passing it through would surface as a confusing parse
    * error downstream (the reference validates parameter references the
    * same way, procedures.rs:640-680). */
  def bindNamed(sql: String, names: Seq[String], rendered: Seq[String]): String = {
    if (SqlText.endsInsideString(sql))
      throw new IllegalArgumentException("unterminated string literal")
    val lower = names.map(_.toLowerCase)
    val code = SqlText.codeMask(sql)
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (code(i) && c == '$' && i + 1 < sql.length &&
          (sql.charAt(i + 1).isLetter || sql.charAt(i + 1) == '_' ||
            sql.charAt(i + 1).isDigit)) {
        var j = i + 1
        while (j < sql.length &&
            (sql.charAt(j).isLetterOrDigit || sql.charAt(j) == '_')) j += 1
        val ref = sql.substring(i + 1, j)
        val idx =
          if (ref.forall(_.isDigit)) ref.toInt - 1
          else lower.indexOf(ref.toLowerCase)
        if (idx < 0 || idx >= rendered.length)
          throw new IllegalArgumentException(
            s"unknown parameter reference $$$ref (have: ${names.mkString(", ")})")
        out ++= rendered(idx)
        i = j
      } else { out += c; i += 1 }
    }
    out.toString
  }

  /** A parameter value as a SQL literal. Strings escape BOTH quote
    * forms: '' doubling for the quote itself and \\ doubling for
    * backslashes — Spark's default parser treats backslash as an
    * escape character inside string literals
    * (spark.sql.parser.escapedStringLiterals=false), so an unescaped
    * trailing backslash would swallow the closing quote and a crafted
    * value could break out of the literal entirely. */
  def render(v: Any): String = v match {
    case null => "NULL"
    case None => "NULL"
    case Some(x) => render(x)
    case s: String => "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"
    case b: Boolean => if (b) "TRUE" else "FALSE"
    case t: java.sql.Timestamp => s"TIMESTAMP '${t.toString}'"
    case d: java.sql.Date => s"DATE '${d.toString}'"
    // the java.time shapes Spark rows carry under datetime.java8API
    case d: java.time.LocalDate => s"DATE '${d.toString}'"
    case t: java.time.LocalDateTime =>
      s"TIMESTAMP '${java.sql.Timestamp.valueOf(t).toString}'"
    case t: java.time.Instant =>
      s"TIMESTAMP '${java.sql.Timestamp.from(t).toString}'"
    // non-finite doubles have no bare-literal form in SQL
    case d: Double if d.isNaN || d.isInfinite => s"CAST('$d' AS DOUBLE)"
    case f: Float if f.isNaN || f.isInfinite => s"CAST('$f' AS FLOAT)"
    case n @ (_: Byte | _: Short | _: Int | _: Long | _: Float | _: Double) => n.toString
    case n: BigDecimal => n.toString
    case n: java.math.BigDecimal => n.toString
    case other => throw new IllegalArgumentException(
      s"unsupported parameter type: ${other.getClass.getName}")
  }
}
