package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.DevServers.{HttpReply, MockHttpServer}

/** The REAL HTTP transport against an in-process server: wire-level
  * semantics the fixture fetchers can only assume — redirect chains,
  * ttfb, 429 retry, rate limiting, the never-throw error contract. */
class HttpFetcherSpec extends AnyFunSuite {

  /** Fetcher with a RECORDED sleeper — tests assert pacing without
    * actually sleeping. */
  private def fetcher(minIntervalMs: Long = 0L, maxRetries429: Int = 3,
                      maxBodyBytes: Long = 16L * 1024 * 1024)
      : (HttpFetcher, () => Seq[Long]) = {
    val slept = new java.util.concurrent.CopyOnWriteArrayList[Long]()
    val f = new HttpFetcher(minIntervalMs = minIntervalMs,
      requestTimeoutMs = 10000L, maxRetries429 = maxRetries429,
      maxBodyBytes = maxBodyBytes,
      sleeper = ms => { slept.add(ms); () })
    (f, () => { import scala.jdk.CollectionConverters._; slept.asScala.toSeq })
  }

  test("plain 200: body, headers, ttfb, user agent on the wire, no chain") {
    val srv = new MockHttpServer(_ => HttpReply(200,
      Map("Content-Type" -> "text/html; charset=utf-8", "X-Custom" -> "v1"),
      "<html>hello</html>"))
    try {
      val (f, _) = fetcher()
      val r = f.fetch(s"${srv.base}/page", "graft-test/1.0")
      assert(r.status_code === 200 && r.error.isEmpty)
      assert(r.body === "<html>hello</html>")
      assert(r.headers.exists { case (k, v) =>
        k.equalsIgnoreCase("content-type") && v.startsWith("text/html") })
      assert(r.ttfb > 0.0, "ttfb measured to response headers")
      assert(r.redirects.isEmpty, "no chain without a redirect")
      val ua = srv.requests.get(0).headers.collectFirst {
        case (k, v) if k.equalsIgnoreCase("user-agent") => v }
      assert(ua === Some("graft-test/1.0"))
    } finally srv.stop()
  }

  test("redirect chain records every hop plus the final response") {
    var base = ""
    val srv = new MockHttpServer(req => req.path match {
      case "/a" => HttpReply(302, Map("Location" -> s"$base/b"), "")
      case "/b" => HttpReply(301, Map("Location" -> "/c"), "") // relative
      case "/c" => HttpReply(200, Map("Content-Type" -> "text/html"), "final")
      case p    => HttpReply(404, Map.empty, s"no $p")
    })
    base = srv.base
    try {
      val (f, _) = fetcher()
      val r = f.fetch(s"$base/a", "ua")
      assert(r.status_code === 200 && r.body === "final")
      assert(r.url === s"$base/c", "result url is the FINAL hop's url")
      assert(r.redirects.map(_.status_code) === Seq(302, 301, 200),
        "history hops + final response, reference shape")
      assert(r.redirects.map(h => h.url.stripPrefix(base)) === Seq("/a", "/b", "/c"))
      assert(r.redirects.forall(_.ttfb > 0.0))
    } finally srv.stop()
  }

  test("429 retries honoring Retry-After, then succeeds") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    val srv = new MockHttpServer(_ =>
      if (hits.incrementAndGet() <= 2)
        HttpReply(429, Map("Retry-After" -> "2"), "slow down")
      else HttpReply(200, Map("Content-Type" -> "text/plain"), "ok now"))
    try {
      val (f, slept) = fetcher()
      val r = f.fetch(s"${srv.base}/x", "ua")
      assert(r.status_code === 200 && r.body === "ok now")
      assert(hits.get() === 3)
      assert(slept().count(_ === 2000L) === 2, "two 2s Retry-After waits")
    } finally srv.stop()
  }

  test("429 exhausts retries and returns the final 429") {
    val srv = new MockHttpServer(_ => HttpReply(429, Map.empty, "never"))
    try {
      val (f, _) = fetcher(maxRetries429 = 2)
      val r = f.fetch(s"${srv.base}/x", "ua")
      assert(r.status_code === 429 && r.error.isEmpty)
      assert(srv.requests.size() === 3, "original + 2 retries")
    } finally srv.stop()
  }

  test("transport failure returns the reference error shape, never throws") {
    val srv = new MockHttpServer(_ => HttpReply(200, Map.empty, "x"))
    val deadPort = srv.port
    srv.stop() // nothing listens here anymore
    val (f, _) = fetcher()
    val r = f.fetch(s"http://127.0.0.1:$deadPort/", "ua")
    assert(r.status_code === 0 && r.headers.isEmpty)
    assert(r.error.nonEmpty && r.body === s"Error: ${r.error}")
    assert(r.ttfb === 0.0 && r.redirects.isEmpty)
  }

  test("token bucket paces consecutive fetches") {
    val srv = new MockHttpServer(_ => HttpReply(200, Map.empty, "ok"))
    try {
      val (f, slept) = fetcher(minIntervalMs = 60000L)
      f.fetch(s"${srv.base}/1", "ua")
      assert(slept().isEmpty, "first request is never delayed")
      f.fetch(s"${srv.base}/2", "ua")
      val waits = slept()
      assert(waits.size === 1 && waits.head > 0 && waits.head <= 60000L,
        s"second request waits out the interval, got $waits")
    } finally srv.stop()
  }

  test("body cap bounds a pathological response") {
    val srv = new MockHttpServer(_ =>
      HttpReply(200, Map.empty, "x" * 1000000))
    try {
      val (f, _) = fetcher(maxBodyBytes = 10000L)
      val r = f.fetch(s"${srv.base}/big", "ua")
      assert(r.status_code === 200)
      assert(r.body.length <= 10000)
    } finally srv.stop()
  }

  test("S1 integration: HtmlParserSource staged through the real fetcher") {
    val spark = graft.SparkSpec.session
    val srv = new MockHttpServer(req => req.path match {
      case "/ok.html" => HttpReply(200,
        Map("Content-Type" -> "text/html; charset=utf-8"),
        "<html><head><title>Real Page</title></head><body><h1>hi</h1></body></html>")
      case "/feed.xml" => HttpReply(200,
        Map("Content-Type" -> "application/xml"), "<rss/>")
      case _ => HttpReply(404, Map("Content-Type" -> "text/html"), "gone")
    })
    try {
      // minInterval 0: politeness OFF for the in-process server
      val f = new HttpFetcher(minIntervalMs = 0L)
      val staged = HtmlParserSource.stage(spark,
        Seq(ConfigUrl("set1", s"${srv.base}/ok.html"),
          ConfigUrl("set1", s"${srv.base}/feed.xml"),
          ConfigUrl("set1", s"${srv.base}/missing")),
        f, maxConcurrency = 2)
      val rows = staged.select("url.path", "status_code", "body")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
        .sortBy(_._1)
      assert(rows.map(r => (r._1, r._2)).toSeq ===
        Seq(("/feed.xml", 200), ("/missing", 404), ("/ok.html", 200)))
      assert(rows.find(_._1 == "/ok.html").get._3.contains("Real Page"))
      assert(rows.find(_._1 == "/feed.xml").get._3
        .startsWith("Can't use content-type"), "non-html content-type body")
    } finally srv.stop()
  }
}
