package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus primitives: HTML text extraction (the CCNet pipeline's
  * stage 1 — strip markup before any quality/dedup signal) and URL
  * canonicalization (the key for URL-level dedup and domain mixing).
  *
  * Reference analogue: none — pipeline extensions beside TextAnalysis.
  *
  * Both are pure scan-stage expression trees (regex + array ops, no
  * UDFs, no shuffles): at 100 TB they run inside the parquet scan's
  * codegen stage. Every regex avoids backreferences and stays in the
  * common subset of java.util.regex (Spark) and RE2 (DuckDB/oracle),
  * so the oracle mirrors each step exactly.
  */
object Web {

  /** Visible text of an HTML document: script/style blocks dropped,
    * tags stripped, the five predefined XML entities plus &nbsp;
    * decoded (&amp; LAST, the standard order — decoding it earlier
    * would double-decode &amp;lt;), whitespace collapsed. */
  def extractHtmlText(html: Column): Column = {
    val noScript =
      regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, v)) => regexp_replace(c, e, v) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Canonical URL key: lower-cased scheme and host, default ports
    * dropped, trailing-slash-normalized path, tracking parameters
    * (utm_*, fbclid, gclid) removed, remaining query parameters
    * SORTED (param order is presentation noise), fragment dropped.
    * Two spellings of one resource map to one key — the dedup join
    * key for URL-level dedup. */
  def urlKey(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(url, "^[^:]+://([^/?#]+)", 1))
    val host = when(
        (scheme === "http" && hostPort.endsWith(":80")) ||
        (scheme === "https" && hostPort.endsWith(":443")),
        regexp_replace(hostPort, ":[0-9]+$", ""))
      .otherwise(hostPort)
    val rawPath = regexp_extract(url, "^[^:]+://[^/?#]+([^?#]*)", 1)
    // trailing slashes are presentation noise for dedup purposes:
    // /a/ and /a collapse to /a, the bare origin to /
    val stripped = regexp_replace(rawPath, "/+$", "")
    val path = when(stripped === "", lit("/")).otherwise(stripped)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = array_join(
      array_sort(filter(split(query, "&"), p =>
        p =!= "" &&
          !p.rlike("^(?i)(utm_[a-zA-Z_]+|fbclid|gclid)="))), "&")
    concat(scheme, lit("://"), host, path,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** Registrable-ish domain grouping key: the last two labels of the
    * host (example.com from a.b.example.com) — the per-site
    * aggregation key for domain quotas and per-site dedup. (A full
    * public-suffix list is a data file, not logic; two labels is the
    * standard approximation without one.) */
  def domainOf(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
}
