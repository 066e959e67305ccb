package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Url
import graft.sources.{ConfigUrl, FixtureFetcher, HtmlParserSource, RobotstxtSource}

class CheckCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val pages = Map(
    "https://ex.com/a" -> "<html><head><title>Shared Title</title><meta name=\"description\" content=\"da\"><link rel=\"canonical\" href=\"https://ex.com/a\"></head><body><h1>one</h1></body></html>",
    "https://ex.com/b" -> "<html><head><title>Shared Title</title></head><body><h1>x</h1><h1>y</h1></body></html>",
    "https://ex.com/c" -> "<html><head><title>Unique</title><title>Second</title></head><body></body></html>",
    "https://ex.com/d" -> "<html><head><title></title></head><body><h1>z</h1></body></html>")

  private def staged = HtmlParserSource.stage(spark,
    pages.keys.toSeq.sorted.map(u => ConfigUrl("set1", u)),
    FixtureFetcher.html(pages),
    now = () => java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))

  private def checkMap(df: org.apache.spark.sql.DataFrame): Map[String, (Boolean, String, String, String)] =
    df.select(Url.render(col("url")).as("u"), col("valid"), col("value"),
        col("diff"), col("error"))
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(1), r.getString(2), r.getString(3), r.getString(4)))).toMap

  test("has_title: present/missing/empty, multi-title docs skipped") {
    val m = checkMap(CheckCatalog.hasTitle(staged))
    assert(m("https://ex.com/a") === ((true, "Shared Title", "", "")))
    assert(!m.contains("https://ex.com/c"), "multi-title doc is skipped")
    assert(m("https://ex.com/d")._1 === false, "empty title fails has_title")
  }

  test("has_multiple_titles flags doc c only") {
    val m = checkMap(CheckCatalog.hasMultipleTitles(staged))
    assert(m("https://ex.com/c") ===
      ((false, "", "", "several titletags on page detected")))
    assert(m("https://ex.com/a")._1 === true)
  }

  test("is_title_empty") {
    val m = checkMap(CheckCatalog.isTitleEmpty(staged))
    assert(m("https://ex.com/d")._1 === false)
    assert(m("https://ex.com/a")._1 === true)
  }

  test("has_title_duplicates: a/b share, diff lists the other url") {
    val m = checkMap(CheckCatalog.hasTitleDuplicates(staged))
    assert(m("https://ex.com/a") ===
      ((false, "Shared Title", "https://ex.com/b",
        "title duplicates in url-set detected")))
    assert(m("https://ex.com/b")._3 === "https://ex.com/a")
    // c excluded (multi), d excluded (empty single title)
    assert(!m.contains("https://ex.com/c") && !m.contains("https://ex.com/d"))
  }

  test("has_title_changed vs history (as-of join)") {
    val history = HtmlParserSource.stage(spark,
      Seq(ConfigUrl("set1", "https://ex.com/a")),
      FixtureFetcher.html(Map(
        "https://ex.com/a" -> "<html><head><title>Old Title</title></head><body></body></html>")),
      now = () => java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    val m = checkMap(CheckCatalog.hasTitleChanged(staged, history))
    assert(m("https://ex.com/a") ===
      ((false, "Shared Title", "Old Title", "title has changed")))
    // no history → previous '' → nonempty title counts as changed
    assert(m("https://ex.com/b")._1 === false)
  }

  test("canonical family") {
    val hasC = checkMap(CheckCatalog.hasCanonical(staged))
    assert(hasC("https://ex.com/a")._1 === true)
    assert(hasC("https://ex.com/b")._1 === false)
    val self = checkMap(CheckCatalog.canonicalSelfReferencing(staged))
    assert(self("https://ex.com/a")._1 === true)
    val statuses = Seq(("https://ex.com/a", 200)).toDF("url", "status")
    val live = checkMap(CheckCatalog.canonicalHref200(staged, statuses))
    assert(live("https://ex.com/a")._1 === true)
    assert(live("https://ex.com/b")._1 === false, "missing canonical → no 200")
  }

  test("htmlheadings h1 count") {
    val m = checkMap(CheckCatalog.countHeadlineH1(staged))
    assert(m("https://ex.com/a")._1 === true)
    assert(m("https://ex.com/b") ===
      ((false, "2", "", "more than one headline detected")))
  }

  test("responseheader checks use lowercased header map") {
    val docs = Seq(
      ("set1", Url("https", "ex.com", "/a", ""), 200,
        Map("Content-Encoding" -> "GZIP", "Cache-Control" -> "no-cache"),
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      ("set1", Url("https", "ex.com", "/b", ""), 404,
        Map.empty[String, String],
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    ).toDF("urlset", "url", "status_code", "headers", "date")
    val out = CheckCatalog.responseHeaders(docs, Map(
      "status_code" -> "200", "content_encoding" -> "gzip",
      "cache_control" -> "no-cache"))
    val m = out.select(concat_ws("|", Url.render(col("url")), col("check")),
        col("valid")).as[(String, Boolean)].collect().toMap
    assert(m("https://ex.com/a|responseheader-status_code"))
    assert(m("https://ex.com/a|responseheader-content_encoding"),
      "value compare is case-insensitive")
    assert(m("https://ex.com/a|responseheader-cache_control"))
    assert(!m("https://ex.com/b|responseheader-status_code"))
    assert(!m("https://ex.com/b|responseheader-content_encoding"),
      "absent header → invalid, not null")
  }

  test("robotstxt family over fixture robots.txt") {
    val robots = RobotstxtSource.stage(spark,
      Seq(ConfigUrl("set1", "https://ex.com/sub/"),
          ConfigUrl("set1", "https://other.com/")),
      new FixtureFetcher(Map(
        "https://ex.com/sub/robots.txt" -> graft.sources.FetchResult(
          "https://ex.com/sub/robots.txt", 200, Map("content-type" -> "text/plain"),
          "User-agent: *\nSitemap: https://ex.com/sitemap.xml\n"))),
      now = () => java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    val sc = checkMap(CheckCatalog.robotsStatusCode(robots))
    assert(sc("https://ex.com/sub/robots.txt")._1 === true)
    assert(sc("https://other.com/robots.txt")._1 === false)
    val has = checkMap(CheckCatalog.robotsHasSitemap(robots))
    assert(has("https://ex.com/sub/robots.txt") ===
      ((true, "https://ex.com/sitemap.xml", "", "")))
    val statuses = Seq(("https://ex.com/sitemap.xml", 200)).toDF("url", "status")
    val acc = checkMap(CheckCatalog.robotsSitemapAccess(robots, statuses))
    assert(acc("https://ex.com/sub/robots.txt")._1 === true)
  }

  test("pagespeed threshold checks over Lighthouse JSON") {
    val body = """{"lighthouseResult":{"audits":{
      "first-contentful-paint":{"score":0.93,"numericValue":1200.5},
      "interactive":{"score":0.4}}}}"""
    val docs = Seq(
      ("set1", Url("https", "ex.com", "/", ""), "desktop", body,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    ).toDF("urlset", "url", "strategy", "body", "date")
    val fcp = CheckCatalog.pagespeedThreshold(docs, "fcp_score_",
      "first-contentful-paint", "desktop", 0.9)
    assert(fcp.select("valid").head().getBoolean(0) === true)
    assert(fcp.select("check").head().getString(0) === "pagespeed-fcp_score_desktop")
    val tti = CheckCatalog.pagespeedThreshold(docs, "tti_score_",
      "interactive", "desktop", 0.9)
    assert(tti.select("valid").head().getBoolean(0) === false)
    val disp = CheckCatalog.pagespeedThreshold(docs, "fcp_display_",
      "first-contentful-paint", "desktop", 2000, displayMode = true)
    assert(disp.select("valid").head().getBoolean(0) === true)
    val missing = CheckCatalog.pagespeedThreshold(docs, "tbt_score_",
      "total-blocking-time", "desktop", 0.5)
    assert(missing.select("valid", "error").as[(Boolean, String)].head()
      === ((false, "audit missing")))
  }
}
