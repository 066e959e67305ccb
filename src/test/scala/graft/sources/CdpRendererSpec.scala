package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.DevServers.MockDevtoolsServer

/** The REAL headless-browser transport against an in-process devtools
  * endpoint: full wire semantics — HTTP tab lifecycle, RFC6455
  * handshake and masked frames, CDP command correlation, the load
  * event gate — plus every branch of the never-throw contract. */
class CdpRendererSpec extends AnyFunSuite {

  private def rendered(u: String) =
    s"<html><body>rendered:$u</body></html>"

  test("render drives the full CDP sequence and returns the DOM") {
    val srv = new MockDevtoolsServer(rendered)
    try {
      val r = new CdpRenderer(srv.base, pageLoadTimeoutMs = 5000L,
        scriptTimeoutMs = 5000L, controlTimeoutMs = 5000L,
        minIntervalMs = 0L)
      val out = r.render("https://ex.com/spa")
      assert(out === rendered("https://ex.com/spa"))
      assert(srv.navigated.get(0) === "https://ex.com/spa",
        "navigation went over the wire")
      assert(srv.closedTabs.size() === 1, "tab closed after the render")
      // a second render opens a fresh tab — the adapter leaks nothing
      assert(r.render("https://ex.com/two") === rendered("https://ex.com/two"))
      assert(srv.closedTabs.size() === 2)
    } finally srv.stop()
  }

  test("endpoint down / tab create refused / load timeout all collapse " +
      "to the reference's not-configured body, never a throw") {
    // endpoint down: nothing listens on the port
    val dead = new java.net.ServerSocket(0)
    val deadPort = dead.getLocalPort
    dead.close()
    val r1 = new CdpRenderer(s"http://127.0.0.1:$deadPort",
      controlTimeoutMs = 1000L)
    assert(r1.render("https://ex.com/x") === Renderer.NotConfigured)
    // tab create refused (browser at capacity)
    val refusing = new MockDevtoolsServer(rendered, refuseTabs = true)
    try assert(new CdpRenderer(refusing.base, controlTimeoutMs = 2000L)
      .render("https://ex.com/x") === Renderer.NotConfigured)
    finally refusing.stop()
    // navigation never completes: loadEventFired never arrives
    val hung = new MockDevtoolsServer(rendered, fireLoadEvent = false)
    try {
      val r = new CdpRenderer(hung.base, pageLoadTimeoutMs = 500L,
        controlTimeoutMs = 2000L)
      assert(r.render("https://ex.com/slow") === Renderer.NotConfigured)
      assert(hung.closedTabs.size() === 1,
        "the timed-out tab is still closed best-effort")
    } finally hung.stop()
  }

  test("tab concurrency is bounded and dispatches are paced — the " +
      "reference envelope (10 parallel, 3 s between requests)") {
    val srv = new MockDevtoolsServer(rendered)
    import scala.jdk.CollectionConverters._
    try {
      // 8 threads stampede a 2-tab renderer: the endpoint must never
      // see more than 2 tabs open at once, and every render completes
      val sleeps = new java.util.concurrent.CopyOnWriteArrayList[Long]()
      val r = new CdpRenderer(srv.base, pageLoadTimeoutMs = 5000L,
        scriptTimeoutMs = 5000L, controlTimeoutMs = 5000L,
        minIntervalMs = 3000L, maxConcurrentTabs = 2,
        sleeper = ms => { sleeps.add(ms); () })
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        val results = pool.invokeAll(
          (0 until 8).map { i =>
            new java.util.concurrent.Callable[String] {
              def call(): String = r.render(s"https://ex.com/p$i")
            }
          }.asJava).asScala.map(_.get())
        assert(results.toSet ===
          (0 until 8).map(i => rendered(s"https://ex.com/p$i")).toSet)
      } finally pool.shutdown()
      assert(srv.maxOpenTabs.get() <= 2,
        s"endpoint saw ${srv.maxOpenTabs.get()} concurrent tabs")
      assert(srv.closedTabs.size() === 8, "every tab closed")
      // pacing: 8 dispatches through the bucket → 7 recorded waits,
      // each bounded by the configured interval (recorded, not slept —
      // the HttpFetcher spec discipline)
      assert(sleeps.size() === 7, s"recorded waits: $sleeps")
      assert(sleeps.asScala.forall(ms => ms > 0 && ms <= 3000L), sleeps)
    } finally srv.stop()
  }

  test("HtmlParserSource render path works end-to-end through the real " +
      "adapter") {
    val spark = graft.SparkSpec.session
    import org.apache.spark.sql.functions.col
    val srv = new MockDevtoolsServer(rendered)
    try {
      val fetcher = FixtureFetcher.html(Map(
        "https://ex.com/spa" -> "<html>raw shell</html>",
        "https://ex.com/plain" -> "<html>plain</html>"))
      val renderer = new CdpRenderer(srv.base, pageLoadTimeoutMs = 5000L,
        scriptTimeoutMs = 5000L, controlTimeoutMs = 5000L,
        minIntervalMs = 0L)
      val now = () => new java.sql.Timestamp(1700000000000L)
      val staged = HtmlParserSource.stage(spark,
        Seq(ConfigUrl("s", "https://ex.com/spa", render = true),
          ConfigUrl("s", "https://ex.com/plain")),
        fetcher, now = now, renderer = Some(renderer))
        .select(col("url.path"), col("body"), col("rendered"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
        .toSet
      assert(staged === Set(
        ("/spa", rendered("https://ex.com/spa"), true),
        ("/plain", "<html>plain</html>", false)))
    } finally srv.stop()
  }
}
