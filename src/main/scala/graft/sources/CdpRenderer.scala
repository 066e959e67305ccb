package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse, WebSocket}
import java.time.Duration
import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}
import com.fasterxml.jackson.databind.ObjectMapper
import scala.util.control.NonFatal

/** Real headless-browser transport for the [[Renderer]] boundary, over
  * the Chrome DevTools Protocol — the production counterpart of
  * [[FixtureRenderer]], replacing the reference's chromedriver path
  * (html_parser.py:120-132) with the protocol Chrome itself exposes
  * (`chrome --headless --remote-debugging-port=9222`; any CDP endpoint
  * works, including a browserless container).
  *
  * Per URL: one tab is created over the endpoint's HTTP control surface
  * (`PUT /json/new`, with the legacy `GET` fallback for pre-111
  * Chrome), a WebSocket attaches to the tab's debugger URL, and the
  * render is `Page.enable` → `Page.navigate` → await
  * `Page.loadEventFired` → `Runtime.evaluate(document.documentElement
  * .outerHTML)` — the same "DOM at load-complete" surface
  * `driver.page_source` read. The tab is closed best-effort afterwards
  * (`GET /json/close/<id>`), so a crashed render leaks at most one tab
  * the browser's own idle reaper collects.
  *
  * Holds the whole [[Renderer]] production contract:
  *  1. body-only — status/headers/ttfb stay with the RAW fetch
  *     ([[HtmlParserSource.stage]] invokes this for text/html only);
  *  2. NEVER throws — every failure (endpoint down, tab create
  *     refused, navigation or script timeout, tab crash mid-render)
  *     returns [[Renderer.NotConfigured]], the reference's collapsed
  *     WebDriverException body; a throw would kill the fetch partition;
  *  3. per-URL wall time is bounded by `pageLoadTimeoutMs` +
  *     `scriptTimeoutMs` + the HTTP `controlTimeoutMs`s — size them
  *     against the module budget (reference envelope: 600 s);
  *  4. the HttpClient is `@transient lazy`, built once per executor
  *     closure; WebSockets live per render call, never serialized;
  *  5. output is the DOM at load-complete — replay identity is the
  *     staging append's concern;
  *  6. the [[HttpFetcher]] pacing discipline, ported to the render
  *     path (reference envelope google_pagespeed.py:32-35): at least
  *     `minIntervalMs` between tab dispatches per renderer instance
  *     (SECONDS_BETWEEN_REQUESTS = 3), and at most
  *     `maxConcurrentTabs` tabs open against the endpoint at once
  *     (MAX_PARALLEL_REQUESTS = 10) — partitions sharing one executor
  *     renderer cannot stampede a browser whose tab pool is the
  *     scarce resource, and a thousands-URL rendered urlset paces
  *     predictably inside the 600 s module budget.
  *
  * Specced against an in-process fake devtools server
  * ([[graft.tools.DevServers.MockDevtoolsServer]]) driving the full
  * wire protocol — HTTP tab control, RFC6455 handshake and frames, CDP
  * id correlation and events — the [[HttpFetcher]]/SmtpTransport
  * discipline. */
final class CdpRenderer(
    endpoint: String = "http://127.0.0.1:9222",
    pageLoadTimeoutMs: Long = 30000L,
    scriptTimeoutMs: Long = 10000L,
    controlTimeoutMs: Long = 10000L,
    minIntervalMs: Long = 3000L,
    maxConcurrentTabs: Int = 10,
    sleeper: Long => Unit = Thread.sleep) extends Renderer {

  require(maxConcurrentTabs > 0,
    s"maxConcurrentTabs must be positive, got $maxConcurrentTabs")

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofMillis(controlTimeoutMs))
    .build()
  @transient private lazy val mapper = new ObjectMapper()

  // tab-pool bound: acquired around the WHOLE tab lifetime (create →
  // render → close), fair so a stampede drains FIFO
  @transient private lazy val tabPermits =
    new java.util.concurrent.Semaphore(maxConcurrentTabs, true)
  @transient private var lastDispatchAt = 0L

  /** The HttpFetcher token bucket, verbatim: at least `minIntervalMs`
    * between tab DISPATCHES per instance (concurrent callers queue on
    * the lock, so the pacing holds across threads too). */
  private def throttle(): Unit = synchronized {
    val wait = lastDispatchAt + minIntervalMs - System.currentTimeMillis()
    if (wait > 0 && lastDispatchAt > 0) sleeper(wait)
    lastDispatchAt = System.currentTimeMillis()
  }

  override def render(url: String): String =
    try {
      tabPermits.acquire()
      try {
        throttle()
        val tab = newTab()
        try renderInTab(tab.wsUrl, url)
        finally closeTab(tab.id) // best-effort; failures already collapsed
      } finally tabPermits.release()
    } catch {
      case NonFatal(_) => Renderer.NotConfigured
    }

  private final case class Tab(id: String, wsUrl: String)

  /** `PUT /json/new` (Chrome ≥ 111; `GET` fallback for older
    * browsers) → (tab id, webSocketDebuggerUrl). */
  private def newTab(): Tab = {
    val uri = URI.create(s"$endpoint/json/new?about:blank")
    def send(method: String): HttpResponse[String] =
      client.send(HttpRequest.newBuilder(uri)
          .timeout(Duration.ofMillis(controlTimeoutMs))
          .method(method, HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofString())
    var resp = send("PUT")
    if (resp.statusCode() / 100 != 2) resp = send("GET")
    require(resp.statusCode() / 100 == 2,
      s"tab create failed: HTTP ${resp.statusCode()}")
    val node = mapper.readTree(resp.body())
    val ws = node.path("webSocketDebuggerUrl").asText("")
    require(ws.nonEmpty, "no webSocketDebuggerUrl in /json/new reply")
    Tab(node.path("id").asText(""), ws)
  }

  private def closeTab(id: String): Unit =
    try {
      if (id.nonEmpty) {
        client.send(HttpRequest.newBuilder(
            URI.create(s"$endpoint/json/close/$id"))
          .timeout(Duration.ofMillis(controlTimeoutMs)).GET().build(),
          HttpResponse.BodyHandlers.discarding())
        ()
      }
    } catch { case NonFatal(_) => () }

  /** One CDP session: incoming messages (responses and events alike)
    * land on a queue; commands correlate by id, events by method. */
  private def renderInTab(wsUrl: String, url: String): String = {
    val inbox = new LinkedBlockingQueue[String]()
    val listener = new WebSocket.Listener {
      private val buf = new StringBuilder
      override def onText(ws: WebSocket, data: CharSequence,
                          last: Boolean): java.util.concurrent.CompletionStage[_] = {
        buf.append(data)
        if (last) { inbox.put(buf.toString); buf.setLength(0) }
        ws.request(1)
        null
      }
    }
    val ws = client.newWebSocketBuilder()
      .connectTimeout(Duration.ofMillis(controlTimeoutMs))
      .buildAsync(URI.create(wsUrl), listener)
      .get(controlTimeoutMs, TimeUnit.MILLISECONDS)
    try {
      var nextId = 0
      def command(method: String, params: (String, Any)*): Int = {
        nextId += 1
        val node = mapper.createObjectNode()
        node.put("id", nextId)
        node.put("method", method)
        val p = node.putObject("params")
        params.foreach {
          case (k, v: Boolean) => p.put(k, v)
          case (k, v)          => p.put(k, String.valueOf(v))
        }
        ws.sendText(mapper.writeValueAsString(node), true)
          .get(controlTimeoutMs, TimeUnit.MILLISECONDS)
        nextId
      }
      /** Poll the inbox until `pred` matches a parsed message.
        * Non-matching messages are BUFFERED, not dropped: with
        * Page.enable on, a cached/instant load can deliver
        * Page.loadEventFired before the Page.navigate ack, and
        * discarding it would make the later load-await burn its full
        * timeout and collapse a successful render to NotConfigured. */
      val pending = scala.collection.mutable.ArrayBuffer
        .empty[com.fasterxml.jackson.databind.JsonNode]
      def await(timeoutMs: Long)(
          pred: com.fasterxml.jackson.databind.JsonNode => Boolean)
          : com.fasterxml.jackson.databind.JsonNode = {
        val i = pending.indexWhere(pred)
        if (i >= 0) return pending.remove(i)
        val deadline = System.currentTimeMillis() + timeoutMs
        while (true) {
          val wait = deadline - System.currentTimeMillis()
          require(wait > 0, "CDP await timed out")
          val raw = inbox.poll(wait, TimeUnit.MILLISECONDS)
          require(raw != null, "CDP await timed out")
          val node = mapper.readTree(raw)
          if (pred(node)) return node
          pending += node
        }
        sys.error("unreachable")
      }
      val enableId = command("Page.enable")
      await(controlTimeoutMs)(_.path("id").asInt(-1) == enableId)
      val navId = command("Page.navigate", "url" -> url)
      await(controlTimeoutMs)(_.path("id").asInt(-1) == navId)
      await(pageLoadTimeoutMs)(
        _.path("method").asText("") == "Page.loadEventFired")
      val evalId = command("Runtime.evaluate",
        "expression" -> "document.documentElement.outerHTML",
        "returnByValue" -> true)
      val reply = await(scriptTimeoutMs)(_.path("id").asInt(-1) == evalId)
      val value = reply.path("result").path("result").path("value")
      require(value.isTextual, "Runtime.evaluate returned no DOM string")
      value.asText()
    } finally {
      try {
        ws.sendClose(WebSocket.NORMAL_CLOSURE, "done")
        ws.abort()
      } catch { case NonFatal(_) => () }
    }
  }
}
