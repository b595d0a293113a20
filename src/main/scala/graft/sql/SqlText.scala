package graft.sql

/** Lexical helpers over raw SQL text, shared by the router, the
  * parameter binder, and the engine's reference scanner so all three
  * agree on what is "inside a string literal". Spark's default parser
  * (spark.sql.parser.escapedStringLiterals=false) accepts BOTH quote
  * escapes — `''` doubling and backslash escaping — so the scanner
  * honors both; diverging from the parser here desyncs everything
  * downstream (a `\'` would end the scan mid-literal and flip the
  * string state for the rest of the statement).
  */
object SqlText {

  /** Step over position `i` (known to be inside a string literal whose
    * opening quote was consumed). Returns (next index, still in
    * string). */
  @inline private def stepInString(s: String, i: Int): (Int, Boolean) =
    s.charAt(i) match {
      case '\\' if i + 1 < s.length => (i + 2, true) // backslash escape
      case '\'' if i + 1 < s.length && s.charAt(i + 1) == '\'' => (i + 2, true) // '' doubling
      case '\'' => (i + 1, false)
      case _ => (i + 1, true)
    }

  /** Split at top-level occurrences of `sep`: separators inside
    * (...) nesting, string literals, `--` line comments, or `/​* *​/`
    * block comments don't count. */
  def splitTopLevel(s: String, sep: Char = ','): Seq[String] = {
    val out = Vector.newBuilder[String]
    var start = 0
    var depth = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' =>
          i += 1
          var in = true
          while (i < s.length && in) { val (j, still) = stepInString(s, i); i = j; in = still }
        case '-' if i + 1 < s.length && s.charAt(i + 1) == '-' =>
          while (i < s.length && s.charAt(i) != '\n') i += 1
        case '/' if i + 1 < s.length && s.charAt(i + 1) == '*' =>
          i += 2
          while (i + 1 < s.length && !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
          i = math.min(i + 2, s.length)
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case c if c == sep && depth == 0 =>
          out += s.substring(start, i).trim; start = i + 1; i += 1
        case _ => i += 1
      }
    }
    val last = s.substring(start).trim
    if (last.nonEmpty) out += last
    out.result()
  }

  /** Index of the first top-level occurrence of `c` (outside parens,
    * strings, and comments), or -1. */
  def topLevelIndexOf(s: String, c: Char): Int = {
    var depth = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' =>
          i += 1
          var in = true
          while (i < s.length && in) { val (j, still) = stepInString(s, i); i = j; in = still }
        case '-' if i + 1 < s.length && s.charAt(i + 1) == '-' =>
          while (i < s.length && s.charAt(i) != '\n') i += 1
        case '/' if i + 1 < s.length && s.charAt(i + 1) == '*' =>
          i += 2
          while (i + 1 < s.length && !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
          i = math.min(i + 2, s.length)
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case ch if ch == c && depth == 0 => return i
        case _ => i += 1
      }
    }
    -1
  }

  /** Drop leading whitespace, `--` line comments, and block comments —
    * the router's statement regexes are start-anchored, so a statement
    * that BEGINS with a comment must shed it before classification. */
  @annotation.tailrec
  def stripLeadingComments(s: String): String = {
    val t = s.dropWhile(_.isWhitespace)
    if (t.startsWith("--")) stripLeadingComments(t.dropWhile(_ != '\n'))
    else if (t.startsWith("/*")) {
      val end = t.indexOf("*/", 2)
      if (end < 0) "" else stripLeadingComments(t.substring(end + 2))
    } else t
  }

  /** The text with string literals and comments blanked out (newlines
    * kept) — for word-level reference scans that must not match names
    * inside quoted values or comments. */
  def maskNonCode(s: String): String = {
    val out = new StringBuilder(s.length)
    def blank(ch: Char): Char = if (ch == '\n') '\n' else ' '
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' =>
          out += ' '; i += 1
          var in = true
          while (i < s.length && in) {
            val (j, still) = stepInString(s, i)
            while ({ out += blank(s.charAt(i)); i += 1; i < j }) ()
            in = still
          }
        case '-' if i + 1 < s.length && s.charAt(i + 1) == '-' =>
          while (i < s.length && s.charAt(i) != '\n') { out += ' '; i += 1 }
        case '/' if i + 1 < s.length && s.charAt(i + 1) == '*' =>
          out += ' '; out += ' '; i += 2
          while (i < s.length &&
              !(s.charAt(i) == '*' && i + 1 < s.length && s.charAt(i + 1) == '/')) {
            out += blank(s.charAt(i)); i += 1
          }
          if (i < s.length) { out += ' '; out += ' '; i += 2 }
        case c => out += c; i += 1
      }
    }
    out.toString
  }
}
