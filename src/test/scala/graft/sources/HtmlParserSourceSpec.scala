package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HtmlParserSourceSpec extends SparkSpec {

  private val now = () => java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

  test("error path mirrors the RequestException row shape") {
    val out = HtmlParserSource.stage(spark,
      Seq(ConfigUrl("s", "https://down.example/")),
      new FailingFetcher("connection refused"), now = now).head()
    assert(out.getAs[Int]("status_code") === 0)
    assert(out.getAs[String]("body") === "Error: connection refused")
    assert(out.getAs[Map[String, String]]("headers").isEmpty)
    assert(out.getAs[Int]("num_redirects") === 0)
  }

  test("redirect chain is staged with hop count") {
    val hops = Seq(
      Hop(301, "https://ex.com/old", Map("location" -> "https://ex.com/new"), 12.5),
      Hop(200, "https://ex.com/new", Map("content-type" -> "text/html"), 30.0))
    val fetcher = new FixtureFetcher(Map(
      "https://ex.com/old" -> FetchResult("https://ex.com/old", 200,
        Map("content-type" -> "text/html"), "<html>final</html>",
        redirects = hops, ttfb = 42.5)))
    val out = HtmlParserSource.stage(spark,
      Seq(ConfigUrl("s", "https://ex.com/old")), fetcher, now = now).head()
    assert(out.getAs[Int]("num_redirects") === 1,
      "reference counts only the history hops, not the final response")
    val staged = out.getSeq[org.apache.spark.sql.Row](out.fieldIndex("redirects"))
    assert(staged.map(_.getAs[Int]("status_code")) === Seq(301, 200))
    assert(out.getAs[Double]("ttfb") === 42.5)
  }

  test("non-html content type is replaced by the reference's message") {
    val fetcher = new FixtureFetcher(Map(
      "https://ex.com/x.pdf" -> FetchResult("https://ex.com/x.pdf", 200,
        Map("Content-Type" -> "application/pdf"), "%PDF")))
    val out = HtmlParserSource.stage(spark,
      Seq(ConfigUrl("s", "https://ex.com/x.pdf")), fetcher, now = now).head()
    assert(out.getAs[String]("body") ===
      "Can't use content-type \"application/pdf\" for parsing")
  }

  test("render option: rendered body from the renderer, raw otherwise") {
    val fetcher = FixtureFetcher.html(Map(
      "https://ex.com/spa" -> "<html><div id=app></div></html>",
      "https://ex.com/static" -> "<html>static</html>"))
    val renderer = new FixtureRenderer(Map(
      "https://ex.com/spa" -> "<html><div id=app>hydrated</div></html>"))
    val rows = HtmlParserSource.stage(spark, Seq(
        ConfigUrl("s", "https://ex.com/spa", render = true),
        ConfigUrl("s", "https://ex.com/static")),
      fetcher, now = now, renderer = Some(renderer))
      .select(col("url.path"), col("body"), col("rendered"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getBoolean(2)))
      .toMap
    assert(rows("/spa") === ("<html><div id=app>hydrated</div></html>", true),
      "render=true takes the DOM from the renderer")
    assert(rows("/static") === ("<html>static</html>", false),
      "render=false keeps the raw fetch body")
    // requesting render without a renderer → the reference's error body
    val noR = HtmlParserSource.stage(spark,
        Seq(ConfigUrl("s", "https://ex.com/spa", render = true)),
        fetcher, now = now).head()
    assert(noR.getAs[String]("body") === Renderer.NotConfigured)
    assert(noR.getAs[Int]("status_code") === 200,
      "status still comes from the raw request")
  }

  test("renderer contract: html-only invocation, raw metadata, error body") {
    // contract point 1: the renderer is consulted ONLY for text/html
    // bodies whose raw fetch succeeded — never for non-html or errors
    // (the spy echoes the url, so any unexpected invocation shows up in
    // that row's staged body; closures serialize, so no shared state)
    val spying = new Renderer {
      override def render(url: String): String = s"<dom:$url>"
    }
    val fetcher = new FixtureFetcher(Map(
      "https://ex.com/page" -> FetchResult("https://ex.com/page", 200,
        Map("content-type" -> "text/html", "x-served-by" -> "edge1"),
        "<html>raw</html>", ttfb = 0.25),
      "https://ex.com/x.pdf" -> FetchResult("https://ex.com/x.pdf", 200,
        Map("content-type" -> "application/pdf"), "%PDF")))
    val rows = HtmlParserSource.stage(spark, Seq(
        ConfigUrl("s", "https://ex.com/page", render = true),
        ConfigUrl("s", "https://ex.com/x.pdf", render = true),
        ConfigUrl("s", "https://ex.com/down", render = true)),
      new Fetcher {  // /down fails at the raw fetch
        override def fetch(url: String, ua: String): FetchResult =
          if (url.endsWith("/down"))
            FetchResult(url, 0, Map.empty, "Error: refused", error = "refused")
          else fetcher.fetch(url, ua)
      }, now = now, renderer = Some(spying), maxConcurrency = 1)
      .collect().map(r => r.getAs[org.apache.spark.sql.Row]("url").getAs[String]("path") -> r).toMap
    assert(rows("/x.pdf").getAs[String]("body") ===
      "Can't use content-type \"application/pdf\" for parsing",
      "non-html keeps the content-type message — renderer not consulted")
    assert(rows("/down").getAs[String]("body") === "Error: refused",
      "failed raw fetch keeps the error body — renderer not consulted")
    // contract point 2/5: body replaced, raw status/headers/ttfb kept
    val page = rows("/page")
    assert(page.getAs[String]("body") === "<dom:https://ex.com/page>")
    assert(page.getAs[Int]("status_code") === 200)
    assert(page.getAs[Double]("ttfb") === 0.25)
    assert(page.getAs[Map[String, String]]("headers")("x-served-by") === "edge1",
      "metadata comes from the RAW request, only the body is rendered")
    // contract point 2: a renderer failure is an error STRING row, and the
    // rest of the partition still stages (nothing thrown)
    val failing = new Renderer {
      override def render(url: String): String = Renderer.NotConfigured
    }
    val out = HtmlParserSource.stage(spark, Seq(
        ConfigUrl("s", "https://ex.com/page", render = true)),
      fetcher, now = now, renderer = Some(failing)).head()
    assert(out.getAs[String]("body") === Renderer.NotConfigured)
    assert(out.getAs[Boolean]("rendered") === true)
  }

  test("url parses into the struct shape") {
    val u = HtmlParserSource.parseUrl("https://Sub.Example.com/a/b?x=1&y=2")
    assert(u === graft.core.Url("https", "Sub.Example.com", "/a/b", "x=1&y=2"))
    assert(HtmlParserSource.parseUrl("https://ex.com") ===
      graft.core.Url("https", "ex.com", "", ""))
  }
}
