package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML feature extraction as column programs (regex-based; the
  * environment has no DOM library on the compile classpath).
  *
  * Mirrors the reference's BeautifulSoup extractions:
  *  - titles: /root/reference/modules/operation/custom/metatags.py:73-87
  *  - meta descriptions: metatags.py:381-395
  *  - canonical: metatags.py:689-699
  *  - h1 count: htmlheadings.py:64-68
  *
  * Design note vs the reference: it re-parses the same body 5+ times
  * (metatags.py:75,290,383,598,692). Here every extraction is an
  * expression over one scanned column, so Catalyst collapses them into
  * one projection over one scan — parse-once by construction.
  */
object HtmlFunctions {

  /** All <title> texts (trimmed). */
  def titles(html: Column): Column =
    transform(
      regexp_extract_all(html, lit("(?is)<title[^>]*>(.*?)</title>"), lit(1)),
      t => trim(t))

  def firstTitle(html: Column): Column =
    coalesce(element_at(titles(html), 1), lit(""))

  def titleCount(html: Column): Column = size(titles(html))

  /** content= of <meta name="description">, any attribute order. */
  def metaDescriptions(html: Column): Column =
    regexp_extract_all(html,
      lit("(?is)<meta\\b(?=[^>]*\\bname\\s*=\\s*[\"']description[\"'])[^>]*\\bcontent\\s*=\\s*[\"']([^\"']*)[\"'][^>]*>"),
      lit(1))

  /** href of <link rel="canonical">. Empty string when absent. */
  def canonical(html: Column): Column =
    coalesce(element_at(regexp_extract_all(html,
      lit("(?is)<link\\b(?=[^>]*\\brel\\s*=\\s*[\"']canonical[\"'])[^>]*\\bhref\\s*=\\s*[\"']([^\"']*)[\"'][^>]*>"),
      lit(1)), 1), lit(""))

  /** Count of <h1> elements (htmlheadings-count_headline_h1). */
  def h1Count(html: Column): Column =
    size(regexp_extract_all(html, lit("(?is)<h1[\\s>]"), lit(0)))

  /** Sitemap URLs declared in a robots.txt body
    * (operation/robotstxt.py:113-118) — pure regexp, no UDF. */
  def robotsSitemaps(body: Column): Column =
    regexp_extract_all(body, lit("(?im)^\\s*sitemap:\\s*(\\S+)"), lit(1))

  /** All ABSOLUTE http(s) href targets of <a> elements, document order.
    * Relative links stay inside the page's own host and carry no
    * cross-host signal, so the link-graph builder ([[graft.operators
    * .Graph.hostEdges]]) wants exactly these. Pure regexp (codegen'd),
    * any attribute order around href. */
  def outLinks(html: Column): Column =
    regexp_extract_all(html,
      lit("(?is)<a\\b[^>]*\\bhref\\s*=\\s*[\"'](https?://[^\"'\\s]+)[\"']"),
      lit(1))

  /** One pattern for (href, anchor-text) pairs — [[outLinks]]' href
    * grammar extended through the anchor's close tag so group 2
    * captures the inner markup. RE2-compatible (lazy `.*?`, no
    * backreferences) so the oracle replays it. */
  val AnchorPairRe: String = "(?is)<a\\b[^>]*\\bhref\\s*=\\s*" +
    "[\"'](https?://[^\"'\\s]+)[\"'][^>]*>(.*?)</a>"

  /** (href, text) of every absolute http(s) anchor — the anchor-TEXT
    * complement of [[outLinks]]: anchor text is how the rest of the web
    * DESCRIBES the target page, the classic retrieval/ranking signal a
    * crawl-scale index builds alongside the link graph
    * ([[graft.operators.Graph.anchorTerms]] aggregates it per target
    * host). Two positionally-aligned `regexp_extract_all` passes over
    * the ONE [[AnchorPairRe]] pattern zip into structs; inner markup is
    * stripped to whitespace-collapsed text ([[TextFunctions.stripHtml]]'s
    * tag rule). Anchors whose text strips to empty are kept with '' —
    * they still carry the edge; callers filter when only worded anchors
    * matter. Pure codegen'd Columns, no UDF. */
  def anchorTexts(html: Column): Column =
    zip_with(
      regexp_extract_all(html, lit(AnchorPairRe), lit(1)),
      regexp_extract_all(html, lit(AnchorPairRe), lit(2)),
      (h, t) => struct(h.as("href"),
        trim(regexp_replace(regexp_replace(t, "(?s)<[^>]*>", " "),
          "\\s+", " ")).as("text")))

  /** Host of an absolute http(s) URL — lower-cased, userinfo and port
    * stripped; null for anything else. RFC-lite by design: a crawl's
    * host graph wants a deterministic, engine-portable extraction (the
    * same regex replays in the oracle SQL), not full URI semantics —
    * [[graft.core.Url.parse]] is the full parser for single-URL work. */
  def urlHost(url: Column): Column = {
    val h = lower(regexp_extract(url,
      "(?i)^https?://(?:[^/?#@]*@)?([^/?#:]+)", 1))
    when(length(h) > 0, h)
  }

  /** Well-known second-level public suffixes for
    * [[registrableDomain]] — the high-traffic entries of the Public
    * Suffix List's cc-SLD family. Deliberately a small static set:
    * the full PSL is an external, mutable artifact; the grouping this
    * feeds (per-site caps and gates) degrades gracefully when a rare
    * suffix is missed (one site splits into a few host groups), and
    * callers with the PSL on hand can pre-map hosts themselves. */
  val SecondLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "com.br", "net.br", "org.br", "com.cn", "net.cn", "org.cn",
    "co.in", "net.in", "org.in", "co.kr", "or.kr", "com.mx",
    "co.nz", "net.nz", "org.nz", "com.sg", "co.za", "com.tr",
    "com.tw")

  /** Registrable domain (eTLD+1-LITE) of a host — the grouping key a
    * C4/RefinedWeb-style pipeline caps and gates per SITE rather than
    * per host (www./m./cdn. subdomains share one reputation; pass this
    * as [[graft.operators.Graph.hostEdges]]' `siteKey` — or collapse
    * its output through it after the fact — to make the authority
    * signal site-level). Heuristic by design: the last two labels, or
    * the last three when the trailing pair is a known second-level
    * public suffix. `suffixes` defaults to the built-in
    * [[SecondLevelSuffixes]] shortlist; callers holding the real
    * Public Suffix List inject their cc-SLD entries here (the list is
    * configuration-sized — it compiles into the expression, no join).
    * Pure-numeric hosts (IPv4 literals) and single-label hosts
    * (intranet names) pass through unchanged. Pure Column program; the
    * identical arithmetic replays in the q170 oracle. */
  def registrableDomain(host: Column,
      suffixes: Seq[String] = SecondLevelSuffixes): Column = {
    val parts = split(host, "\\.")
    val n = size(parts)
    val last2 = array_join(slice(parts, -2, 2), ".")
    val last3 = array_join(slice(parts, -3, 3), ".")
    when(host.rlike("^[0-9.]+$") || n <= 2, host)
      .when(last2.isInCollection(suffixes), last3)
      .otherwise(last2)
  }

  /** Lower-case the keys of a header map
    * (responseheader.py:91's case normalization). */
  def normalizeHeaderKeys(headers: Column): Column =
    map_from_entries(transform(map_entries(headers),
      e => struct(lower(e.getField("key")).as("key"),
                  e.getField("value").as("value"))))
}
