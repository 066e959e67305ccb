package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/** Real HTTP transport for the [[Fetcher]] boundary, over the JDK's
  * `java.net.http.HttpClient` — the production counterpart of
  * [[FixtureFetcher]], matching the observable surface of the
  * reference's `requests.get` path (html_parser.py:66-103):
  *
  *  - redirects are followed MANUALLY (client redirect policy NEVER) so
  *    every hop is captured as a [[Hop]] — status, url, headers, ttfb —
  *    and the final response is appended to the chain exactly like
  *    `response.history + [response]` (html_parser.py:78-87); the
  *    chain stays empty when there was no redirect;
  *  - ttfb is milliseconds from request dispatch to response HEADERS
  *    (the body streams afterwards, `requests.elapsed` semantics);
  *  - failures NEVER throw: any transport error returns
  *    `FetchResult(url, 0, Map.empty, "Error: <msg>", error = msg)` —
  *    the reference's RequestException path (html_parser.py:97-103); a
  *    thrown exception would kill the whole fetch partition;
  *  - a token bucket paces requests: at least `minIntervalMs` between
  *    dispatches PER FETCHER INSTANCE — instances ship one per
  *    partition, so this is the reference's per-worker envelope
  *    (SECONDS_BETWEEN_REQUESTS = 3, google_pagespeed.py:32-35);
  *  - HTTP 429 retries up to `maxRetries429` times honoring a numeric
  *    `Retry-After` (capped at `maxRetryAfterMs`), the reference's
  *    pagespeed retry discipline (pagespeed.py:45-50) pushed down to
  *    the transport where every API source benefits.
  *
  * Scale shape: the HttpClient is `@transient lazy` — built once per
  * executor task closure, never serialized from the driver; bodies are
  * read through a hard `maxBodyBytes` cap so one pathological URL
  * cannot OOM a fetch partition.
  *
  * `sleeper` is injectable for tests (recorded instead of slept). */
final class HttpFetcher(
    minIntervalMs: Long = 3000L,
    requestTimeoutMs: Long = 30000L,
    maxRedirects: Int = 10,
    maxRetries429: Int = 3,
    maxRetryAfterMs: Long = 30000L,
    maxBodyBytes: Long = 16L * 1024 * 1024,
    sleeper: Long => Unit = Thread.sleep) extends Fetcher {

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NEVER)
    .connectTimeout(Duration.ofMillis(requestTimeoutMs))
    .build()

  @transient private var lastDispatchAt = 0L

  private def throttle(): Unit = synchronized {
    val wait = lastDispatchAt + minIntervalMs - System.currentTimeMillis()
    if (wait > 0 && lastDispatchAt > 0) sleeper(wait)
    lastDispatchAt = System.currentTimeMillis()
  }

  override def fetch(url: String, userAgent: String): FetchResult =
    try follow(url, userAgent, Vector.empty, retries429 = 0)
    catch {
      case NonFatal(e) =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
        FetchResult(url, 0, Map.empty, s"Error: $msg", error = msg)
    }

  private val RedirectCodes = Set(301, 302, 303, 307, 308)

  @annotation.tailrec
  private def follow(url: String, userAgent: String, hops: Vector[RawHop],
                     retries429: Int): FetchResult = {
    val hop = one(url, userAgent)
    val location = hop.headers.collectFirst {
      case (k, v) if k.equalsIgnoreCase("location") => v
    }
    if (RedirectCodes.contains(hop.status_code) && location.isDefined &&
        hops.size < maxRedirects) {
      val next = URI.create(url).resolve(location.get).toString
      follow(next, userAgent, hops :+ hop, retries429)
    } else if (hop.status_code == 429 && retries429 < maxRetries429) {
      val retryAfter = hop.headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase("retry-after") => v
      }.flatMap(_.trim.toLongOption)
        // clamp to [0, max] BEFORE converting to millis: a header around
        // 2^53 seconds overflows the *1000 to a negative Long, and a
        // negative value (overflowed or sent literally) makes sleep
        // throw — turning a retryable 429 into a transport error
        .map(s => math.min(math.max(s, 0L), maxRetryAfterMs / 1000L) * 1000L)
        .getOrElse(minIntervalMs)
      sleeper(math.min(retryAfter, maxRetryAfterMs))
      follow(url, userAgent, hops, retries429 + 1)
    } else {
      val chain = // empty unless there WAS a redirect (reference shape:
        // history hops + the final response, html_parser.py:78-87)
        if (hops.isEmpty) Nil
        else (hops :+ hop).map(h => Hop(h.status_code, h.url, h.headers, h.ttfb))
      FetchResult(hop.url, hop.status_code, hop.headers, hop.body,
        redirects = chain, ttfb = hop.ttfb)
    }
  }

  /** One hop's raw exchange (body kept only for the final hop). */
  private final case class RawHop(status_code: Int, url: String,
                                  headers: Map[String, String],
                                  ttfb: Double, body: String)

  private def one(url: String, userAgent: String): RawHop = {
    throttle()
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(requestTimeoutMs))
      .header("User-Agent", userAgent)
      .GET().build()
    val t0 = System.nanoTime()
    val resp: HttpResponse[java.io.InputStream] =
      client.send(req, HttpResponse.BodyHandlers.ofInputStream())
    val ttfb = (System.nanoTime() - t0) / 1e6 // headers received; body below
    val headers = resp.headers().map().asScala.map { case (k, vs) =>
      k -> vs.asScala.mkString(", ")
    }.toMap
    val body = readCapped(resp.body())
    RawHop(resp.statusCode(), url, headers, ttfb, body)
  }

  private def readCapped(in: java.io.InputStream): String = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    try {
      var n = in.read(buf)
      while (n >= 0 && out.size() < maxBodyBytes) {
        out.write(buf, 0, math.min(n, (maxBodyBytes - out.size()).toInt))
        n = in.read(buf)
      }
    } finally in.close()
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }
}
