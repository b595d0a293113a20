package graft.sql

/** Lexical helpers over raw SQL text, shared by the router, the
  * parameter binder, and the engine's reference scanner so every
  * consumer agrees on what is "inside a string literal" or "inside a
  * comment". The scanner models what Spark's default parser accepts:
  * single- AND double-quoted string literals (double quotes are
  * strings, not identifiers, unless ANSI mode flips them), both quote
  * escapes (`''`/`""` doubling and backslash), `--` line comments, and
  * `/​* *​/` block comments. Diverging from the parser here desyncs
  * everything downstream — an unrecognized quote form would flip the
  * string state for the rest of the statement.
  */
object SqlText {

  private final val CODE: Byte = 0
  private final val STR: Byte = 1 // string literal, including its quotes
  private final val COM: Byte = 2 // comment, including its markers

  /** One pass over `s`, classifying every character. All public
    * helpers derive from this single state machine. */
  private def classify(s: String): Array[Byte] = {
    val k = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' || c == '"') {
        val q = c
        k(i) = STR; i += 1
        var in = true
        while (i < s.length && in) {
          k(i) = STR
          s.charAt(i) match {
            case '\\' if i + 1 < s.length => k(i + 1) = STR; i += 2
            case `q` if i + 1 < s.length && s.charAt(i + 1) == q =>
              k(i + 1) = STR; i += 2
            case `q` => in = false; i += 1
            case _ => i += 1
          }
        }
      } else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        while (i < s.length && s.charAt(i) != '\n') { k(i) = COM; i += 1 }
      } else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        k(i) = COM; k(i + 1) = COM; i += 2
        while (i < s.length &&
            !(s.charAt(i) == '*' && i + 1 < s.length && s.charAt(i + 1) == '/')) {
          k(i) = COM; i += 1
        }
        if (i + 1 < s.length) { k(i) = COM; k(i + 1) = COM; i += 2 }
        else if (i < s.length) { k(i) = COM; i += 1 }
      } else { k(i) = CODE; i += 1 }
    }
    k
  }

  /** Split at top-level occurrences of `sep`: separators inside (...)
    * nesting, string literals, or comments don't count. */
  def splitTopLevel(s: String, sep: Char = ','): Seq[String] = {
    val k = classify(s)
    val out = Vector.newBuilder[String]
    var start = 0
    var depth = 0
    var i = 0
    while (i < s.length) {
      if (k(i) == CODE) s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case c if c == sep && depth == 0 =>
          out += s.substring(start, i).trim; start = i + 1
        case _ =>
      }
      i += 1
    }
    val last = s.substring(start).trim
    if (last.nonEmpty) out += last
    out.result()
  }

  /** Index of the first top-level occurrence of `c` (outside parens,
    * strings, and comments), or -1. */
  def topLevelIndexOf(s: String, c: Char): Int = {
    val k = classify(s)
    var depth = 0
    var i = 0
    while (i < s.length) {
      if (k(i) == CODE) s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ch if ch == c && depth == 0 => return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** The text with comments removed (one space each) and everything
    * else — string literals included — kept verbatim. Statement
    * routing runs on this form so the start/end-anchored statement
    * regexes aren't defeated by leading, trailing, or interior
    * comments (`COMMIT -- done` must still be a COMMIT). */
  def stripComments(s: String): String = {
    val k = classify(s)
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (k(i) != COM) out += s.charAt(i)
      else if (out.nonEmpty && out.last != ' ') out += ' '
      i += 1
    }
    out.toString
  }

  /** The text with string literals and comments blanked out (newlines
    * kept) — for word-level reference scans that must not match names
    * inside quoted values or comments. */
  def maskNonCode(s: String): String = {
    val k = classify(s)
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      out += (if (k(i) == CODE) c else if (c == '\n') '\n' else ' ')
      i += 1
    }
    out.toString
  }

  /** Character classes for external scanners (Params.bind): true at
    * positions that are plain code — not string content, not comment. */
  def codeMask(s: String): Array[Boolean] = classify(s).map(_ == CODE)
}
