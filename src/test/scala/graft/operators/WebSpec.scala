package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HTML extraction and URL canonicalization edge cases. */
class WebSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(expr: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("x").select(expr.as("r")).collect()(0).getString(0)

  test("extractHtmlText: blocks, tags, entities, whitespace") {
    val got = one(Web.extractHtmlText(col("x")),
      """<html><head><script>if (a < b && c > d) { x(); }</script>
        |<style>p { color: red; }</style></head>
        |<body><!-- hidden --><h1>Title</h1>
        |<p>A &amp;amp; literal, 1 &lt; 2, &quot;q&quot;, it&#39;s,
        |a&nbsp;b</p></body></html>""".stripMargin)
    // &amp;amp; decodes ONCE to &amp; (amp decoded last, no re-scan)
    assert(got === "Title A &amp; literal, 1 < 2, \"q\", it's, a b")
  }

  test("extractHtmlText: unterminated script eats nothing it should not") {
    // a script block spanning lines, with an attribute-carrying tag
    val got = one(Web.extractHtmlText(col("x")),
      "<script src=\"a.js\">\nvar s = \"</div>\";\n</script>after")
    assert(got === "after")
  }

  test("urlKey: case, default port, tracking params, sort, fragment, slash") {
    def k(u: String): String = one(Web.urlKey(col("x")), u)
    assert(k("HTTPS://Example.COM:443/A/?b=2&utm_source=x&a=1#f") ===
      "https://example.com/A?a=1&b=2")
    assert(k("http://example.com:80/") === "http://example.com/")
    // non-default port survives
    assert(k("http://example.com:8080/x") === "http://example.com:8080/x")
    // tracking-only query vanishes entirely
    assert(k("https://e.com/p?utm_campaign=a&fbclid=b&gclid=c") ===
      "https://e.com/p")
    // bare origin normalizes to /
    assert(k("https://e.com") === "https://e.com/")
    // two spellings of one resource collide
    assert(k("HTTPS://E.com/a/?y=2&x=1") === k("https://e.com/a?x=1&y=2"))
  }

  test("domainOf keeps the last two labels") {
    assert(one(Web.domainOf(col("x")), "a.b.example.com") === "example.com")
    assert(one(Web.domainOf(col("x")), "example.com") === "example.com")
  }
}
