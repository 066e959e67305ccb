package graft.sources

import java.sql.Timestamp

/** One HTTP hop (redirect chain entry) — mirrors the per-hop records of
  * /root/reference/modules/aggregation/custom/html_parser.py:78-87. */
final case class Hop(
    status_code: Int,
    url: String,
    headers: Map[String, String],
    ttfb: Double)

/** A completed fetch — the observable surface of `requests.get` that the
  * reference's sources consume (html_parser.py:66-96). `error` non-empty
  * means the request failed (RequestException path, :97-103). */
final case class FetchResult(
    url: String,
    status_code: Int,
    headers: Map[String, String],
    body: String,
    redirects: Seq[Hop] = Nil,
    ttfb: Double = 0.0,
    error: String = "")

/** Side-effecting fetch boundary. Implementations MUST be Serializable —
  * fetchers ship to executors inside `mapPartitions` source stages
  * (SURVEY §2.11: HTTP fetch is a source-layer concern, never a UDF).
  *
  * Three implementations ship: [[HttpFetcher]] (production — real
  * `java.net.http` transport with per-partition rate limiting, redirect
  * chains, ttfb, 429 retry; integration-tested against an in-process
  * HTTP server since this environment has no egress), [[FixtureFetcher]]
  * (tests/e2e) and [[FailingFetcher]] (error-path tests).
  */
trait Fetcher extends Serializable {
  def fetch(url: String, userAgent: String): FetchResult
}

/** Canned pages keyed by exact URL; unknown URLs return 404. */
final class FixtureFetcher(pages: Map[String, FetchResult]) extends Fetcher {
  override def fetch(url: String, userAgent: String): FetchResult =
    pages.getOrElse(url,
      FetchResult(url, 404, Map("content-type" -> "text/html"), "not found"))
}

object FixtureFetcher {
  /** Convenience: html page map → fixture with 200s + text/html headers. */
  def html(pages: Map[String, String]): FixtureFetcher =
    new FixtureFetcher(pages.map { case (u, body) =>
      u -> FetchResult(u, 200,
        Map("content-type" -> "text/html; charset=utf-8"), body)
    })
}

/** Every fetch fails — drives the reference's RequestException path. */
final class FailingFetcher(message: String = "connection refused") extends Fetcher {
  override def fetch(url: String, userAgent: String): FetchResult =
    FetchResult(url, 0, Map.empty, s"Error: $message", error = message)
}

/** Headless-browser boundary for html_parser's `render` option
  * (html_parser.py:120-132): given a URL whose RAW fetch succeeded with
  * text/html, return the DOM-rendered page source. A production impl
  * drives a remote WebDriver/CDP endpoint; none ships here (no egress).
  *
  * PRODUCTION CONTRACT — an implementation slots in without semantic
  * drift if it holds all of these:
  *
  *  1. Called only for text/html bodies whose raw fetch succeeded —
  *     [[HtmlParserSource.stage]] keeps status/headers/ttfb from the RAW
  *     request and replaces only the body (html_parser.py:91-94). An
  *     implementation must not re-issue the status probe.
  *  2. NEVER throws. Every failure — driver unavailable, navigation
  *     timeout, tab crash — returns an error STRING body; the reference
  *     collapses all WebDriverException to
  *     [[Renderer.NotConfigured]] (html_parser.py:128-129). A thrown
  *     exception would kill the whole fetch partition and lose the
  *     other URLs' staged rows.
  *  3. Bounds per-URL wall time. The fetch stage runs `maxConcurrency`
  *     slots inside a module budget (the reference's envelope is a
  *     600 s module limit), so set page-load + script timeouts such
  *     that timeout × URLs-per-slot stays inside it; on expiry return
  *     the error body, never block the partition.
  *  4. Creates browser sessions lazily per executor/partition
  *     (`@transient lazy val`), one session reused across a partition's
  *     URLs. The trait is Serializable because it ships in the
  *     mapPartitions closure — a live connection must not be serialized
  *     from the driver.
  *  5. Output is the serialized DOM at load-complete; re-rendering the
  *     same URL may legitimately differ (live web). Replay identity is
  *     the staging append's concern, not the renderer's.
  */
trait Renderer extends Serializable {
  def render(url: String): String
}

object Renderer {
  /** The reference's body when rendering is requested but no renderer is
    * available (html_parser.py:129). */
  val NotConfigured = "Error: chromedriver not configured properly"
}

/** Canned rendered DOM per URL; unknown URLs reproduce the reference's
  * not-configured error body. */
final class FixtureRenderer(pages: Map[String, String]) extends Renderer {
  override def render(url: String): String =
    pages.getOrElse(url, Renderer.NotConfigured)
}
