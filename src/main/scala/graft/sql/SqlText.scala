package graft.sql

/** Lexical helpers over raw SQL text, shared by the router, the
  * parameter binder, the temporal preprocessor, and the engine's
  * reference scanner so every consumer agrees on what is "inside a
  * string literal" or "inside a comment". The scanner models what
  * Spark's default parser accepts: single- AND double-quoted string
  * literals (double quotes are strings, not identifiers, unless ANSI
  * mode flips them), both quote escapes (doubling and backslash),
  * backtick-quoted identifiers, `--` line comments, and NESTED
  * `/​* *​/` block comments (Spark 3.0+). Diverging from the parser
  * here desyncs everything downstream — an unrecognized quote form
  * would flip the string state for the rest of the statement.
  */
object SqlText {

  private final val CODE: Byte = 0
  private final val STR: Byte = 1 // string literal, including its quotes
  private final val COM: Byte = 2 // comment, including its markers
  private final val IDT: Byte = 3 // backtick-quoted identifier, incl. ticks
  private final val HINT: Byte = 4 // /*+ ... */ — lexically a comment, semantically planner input

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
      } else if (c == '`') {
        // backtick identifier: `` is an escaped tick; content is opaque
        k(i) = IDT; i += 1
        var in = true
        while (i < s.length && in) {
          k(i) = IDT
          s.charAt(i) match {
            case '`' if i + 1 < s.length && s.charAt(i + 1) == '`' =>
              k(i + 1) = IDT; i += 2
            case '`' => in = false; i += 1
            case _ => i += 1
          }
        }
      } else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        while (i < s.length && s.charAt(i) != '\n') { k(i) = COM; i += 1 }
      } else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        // bracketed comments NEST in Spark: track depth. A comment
        // opening with /*+ is an optimizer HINT — classified apart so
        // stripComments can keep it while dropping true comments, even
        // when the two forms sit back-to-back with no code between
        val cls = if (s.startsWith("/*+", i)) HINT else COM
        var depth = 0
        var done = false
        while (i < s.length && !done) {
          if (s.charAt(i) == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
            k(i) = cls; k(i + 1) = cls; i += 2; depth += 1
          } else if (s.charAt(i) == '*' && i + 1 < s.length && s.charAt(i + 1) == '/') {
            k(i) = cls; k(i + 1) = cls; i += 2; depth -= 1
            done = depth == 0
          } else { k(i) = cls; i += 1 }
        }
      } else { k(i) = CODE; i += 1 }
    }
    k
  }

  /** Split at top-level occurrences of `sep`: separators inside (...)
    * nesting, string literals, identifiers, or comments don't count. */
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

  /** Index of the first top-level occurrence of keyword `word`
    * (case-insensitive, word-bounded, outside parens / strings /
    * identifiers / comments), or -1. What `COPY (query) TO 'path'`
    * parsing needs: a ` TO ` inside the query's string literals or
    * parens must not split it. */
  def topLevelKeywordIndexOf(s: String, word: String): Int = {
    val k = classify(s)
    def wordChar(c: Char) = c.isLetterOrDigit || c == '_'
    var depth = 0
    var i = 0
    while (i < s.length) {
      if (k(i) == CODE) {
        val c = s.charAt(i)
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (depth == 0 && s.regionMatches(true, i, word, 0, word.length) &&
            (i == 0 || !wordChar(s.charAt(i - 1))) &&
            (i + word.length >= s.length || !wordChar(s.charAt(i + word.length))) &&
            (i until i + word.length).forall(j => k(j) == CODE))
          return i
      }
      i += 1
    }
    -1
  }

  /** Index of the first top-level occurrence of `c` (outside parens,
    * strings, identifiers, and comments), or -1. */
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
    * else — string literals and backtick identifiers included — kept
    * verbatim. With `keepHints` (the default), optimizer hint comments
    * (`/​*+ ... *​/`) are preserved — they are instructions to Spark's
    * planner, not commentary; `keepHints = false` drops them too,
    * which statement ROUTING needs because the anchored statement
    * regexes can't see through a hint sitting inside their prefix
    * (`UPDATE /​*+ x *​/ t SET ...`). */
  def stripComments(s: String, keepHints: Boolean = true): String = {
    val k = classify(s)
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      k(i) match {
        case COM =>
          if (out.isEmpty || out.last != ' ') out += ' '
          while (i < s.length && k(i) == COM) i += 1
        case HINT if !keepHints =>
          if (out.isEmpty || out.last != ' ') out += ' '
          while (i < s.length && k(i) == HINT) i += 1
        case _ => out += s.charAt(i); i += 1
      }
    }
    out.toString
  }

  /** The text with string literals, identifiers, and comments blanked
    * out (newlines kept) — for word-level scans that must not match
    * names inside quoted values or comments. Backtick identifier
    * content keeps its WORD characters only (a backtick-quoted table
    * name is still a reference) — quotes or comment markers inside an
    * identifier must not leak into the masked text, where a rescan
    * would misread them as real syntax. */
  def maskNonCode(s: String): String = {
    val k = classify(s)
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      out += (k(i) match {
        case CODE => c
        case IDT =>
          // word chars and dots survive (dotted catalog names like
          // `a.b` must still word-match); newlines keep line structure;
          // anything else (quotes, comment markers) must not leak
          if (c.isLetterOrDigit || c == '_' || c == '.' || c == '\n') c else ' '
        case _ => if (c == '\n') '\n' else ' ' // STR, COM, and HINT content
      })
      i += 1
    }
    out.toString
  }

  /** Character classes for external scanners (Params.bind,
    * TemporalPre): true at positions that are plain code — not string
    * content, not identifier, not comment. */
  def codeMask(s: String): Array[Boolean] = classify(s).map(_ == CODE)

  /** Does the text end inside an unterminated string literal? Used to
    * reject obviously-broken statements with a clear error instead of
    * silently treating the tail as string content. Probe: append a
    * non-quote sentinel — it classifies as string content iff the
    * final literal never closed. */
  def endsInsideString(s: String): Boolean =
    s.nonEmpty && classify(s + "x").last == STR

  /** Same probe for an unterminated backtick identifier. */
  def endsInsideIdentifier(s: String): Boolean =
    s.nonEmpty && classify(s + "x").last == IDT
}
