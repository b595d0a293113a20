package graft.sql

import org.scalatest.funsuite.AnyFunSuite

/** Generator-based properties for the shared SQL text scanner.
  *
  * Random statements are BUILT from tagged fragments — code, quoted
  * strings (both quote chars, both escape forms), backtick
  * identifiers, line/block/nested comments, hints — so the expected
  * character classification is known by construction, independent of
  * the scanner under test (the StateViewSpec independent-oracle
  * pattern applied to lexing). */
class SqlTextSpec extends AnyFunSuite {

  private sealed trait Frag { def text: String }
  private case class Code(text: String) extends Frag
  private case class Str(text: String) extends Frag
  private case class Ident(text: String) extends Frag
  private case class Com(text: String) extends Frag
  private case class Hint(text: String) extends Frag

  private def randomFrags(rnd: scala.util.Random, n: Int): List[Frag] = {
    val frags = List.newBuilder[Frag]
    var parenDepth = 0
    for (_ <- 0 until n) rnd.nextInt(10) match {
      case 0 => frags += Str("'it''s ; -- not a comment'")
      case 1 => frags += Str("'back\\' slash ; /* no */'")
      case 2 => frags += Str("\"dq ; ' \\\" content\"")
      case 3 =>
        frags += Ident("`a.b--c; '`")
        frags += Code(" ")
      case 4 =>
        // the newline TERMINATES a line comment (it is code, not
        // comment), so it is its own code fragment
        frags += Com("-- line; with 'quote' and /* marker")
        frags += Code("\n")
      case 5 => frags += Com("/* block; 'q' -- inner */")
      case 6 => frags += Com("/* outer /* nested; */ still */")
      case 7 => frags += Hint("/*+ BROADCAST(t) */")
      case 8 if parenDepth < 3 && rnd.nextBoolean() =>
        parenDepth += 1; frags += Code("(a, b")
      case 8 if parenDepth > 0 =>
        parenDepth -= 1; frags += Code(") ")
      case _ => frags += Code(s" w${rnd.nextInt(100)} = ${rnd.nextInt(10)} ")
    }
    // close any open parens so depth-based expectations stay simple
    for (_ <- 0 until parenDepth) frags += Code(") ")
    frags.result()
  }

  private def render(frags: List[Frag]): String = frags.map(_.text).mkString

  test("property: codeMask marks exactly the generated code fragments") {
    for (seed <- 1 to 40) {
      val frags = randomFrags(new scala.util.Random(seed), 24)
      val s = render(frags)
      val mask = SqlText.codeMask(s)
      var pos = 0
      for (f <- frags) {
        val expectCode = f.isInstanceOf[Code]
        for (i <- pos until pos + f.text.length) {
          assert(mask(i) === expectCode,
            s"seed=$seed pos=$i frag=$f char='${s.charAt(i)}'")
        }
        pos += f.text.length
      }
    }
  }

  test("property: maskNonCode preserves length, code, and newlines only") {
    for (seed <- 41 to 80) {
      val frags = randomFrags(new scala.util.Random(seed), 24)
      val s = render(frags)
      val m = SqlText.maskNonCode(s)
      assert(m.length === s.length, s"seed=$seed")
      var pos = 0
      for (f <- frags) {
        f match {
          case Code(t) =>
            assert(m.substring(pos, pos + t.length) === t, s"seed=$seed code kept")
          case Ident(t) => // word chars, dots, newlines kept; rest blanked
            for (i <- 0 until t.length) {
              val c = t.charAt(i)
              if (c.isLetterOrDigit || c == '_' || c == '.' || c == '\n')
                assert(m.charAt(pos + i) === c, s"seed=$seed ident")
              else assert(m.charAt(pos + i) === ' ', s"seed=$seed ident blank")
            }
          case other => // strings, comments, hints blank to space/newline
            for (i <- 0 until other.text.length) {
              val c = m.charAt(pos + i)
              assert(c == ' ' || c == '\n', s"seed=$seed blanked frag=$other")
            }
        }
        pos += f.text.length
      }
      // masking is idempotent: a masked text has nothing left to mask
      assert(SqlText.maskNonCode(m) === m, s"seed=$seed idempotence")
    }
  }

  test("property: stripComments drops comments, keeps hints by flag") {
    for (seed <- 81 to 120) {
      val frags = randomFrags(new scala.util.Random(seed), 24)
      val s = render(frags)
      val kept = SqlText.stripComments(s)
      val bare = SqlText.stripComments(s, keepHints = false)
      for (f <- frags) f match {
        case Com(t) =>
          assert(!kept.contains(t), s"seed=$seed comment kept")
          assert(!bare.contains(t), s"seed=$seed comment kept (bare)")
        case Hint(t) =>
          assert(kept.contains(t), s"seed=$seed hint dropped")
          assert(!bare.contains(t), s"seed=$seed hint kept in bare form")
        case Code(t) => assert(kept.contains(t.trim), s"seed=$seed code dropped")
        case Str(t) => assert(kept.contains(t), s"seed=$seed string altered")
        case Ident(t) => assert(kept.contains(t.trim), s"seed=$seed ident altered")
      }
      // stripping is idempotent in both modes
      assert(SqlText.stripComments(kept) === kept, s"seed=$seed idempotence")
      assert(SqlText.stripComments(bare, keepHints = false) === bare, s"seed=$seed")
    }
  }

  test("property: splitTopLevel splits exactly at generated top-level seps") {
    for (seed <- 121 to 160) {
      val rnd = new scala.util.Random(seed)
      // groups of fragment runs joined by top-level ';' code fragments
      val groups = (0 to rnd.nextInt(4)).map(_ => randomFrags(rnd, 8)).toList
      val s = groups.map(render).mkString(";")
      val expected = groups.map(g => render(g).trim).filter(_.nonEmpty)
      val got = SqlText.splitTopLevel(s, ';')
      // trailing empty groups collapse; compare the non-empty prefix
      assert(got === expected, s"seed=$seed input=$s")
      // and each returned segment has no further top-level separator
      for (seg <- got)
        assert(SqlText.splitTopLevel(seg, ';').length <= 1, s"seed=$seed seg=$seg")
    }
  }
}
