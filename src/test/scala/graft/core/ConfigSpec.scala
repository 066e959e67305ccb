package graft.core

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  private val good =
    """urlsets:
      |  seta:
      |    - url: 'https://a.com/'
      |    - url: 'https://a.com/b'
      |      render: true
      |aggregations:
      |  html_parser:
      |    cron: '*/2 * * * *'
      |    urlsets: ['seta']
      |    settings:
      |      useragent: 'ua'
      |operations:
      |  metatags:
      |    cron: '*/5 * * * *'
      |    urlsets:
      |      - url: 'seta'
      |        checks:
      |          title:
      |            has_title: true
      |""".stripMargin

  test("parses urlsets, modules, per-urlset checks, render flag, hash") {
    val cfg = ConfigLoader.load(good)
    assert(cfg.hash.length === 64)
    assert(cfg.urlsetUrls("seta").map(_.url) ===
      Seq("https://a.com/", "https://a.com/b"))
    assert(cfg.urlsetUrls("seta")(1).render === true)
    assert(cfg.aggregation("html_parser").settings("useragent") === "ua")
    assert(cfg.aggregation("html_parser").database === "staging",
      "aggregation default database")
    assert(cfg.operation("metatags").database === "checks",
      "operation default database")
    val checks = cfg.operation("metatags").urlsetChecks("seta")
    assert(checks("title").asInstanceOf[Map[String, Any]]("has_title") === true)
  }

  test("missing cron is a config error") {
    val bad = good.replace("    cron: '*/2 * * * *'\n", "")
    val e = intercept[ConfigLoader.ConfigError](ConfigLoader.load(bad))
    assert(e.getMessage.contains("cron"))
  }

  test("invalid cron shape is a config error") {
    val bad = good.replace("*/2 * * * *", "nonsense")
    intercept[ConfigLoader.ConfigError](ConfigLoader.load(bad))
  }

  test("unknown urlset reference is a config error") {
    val bad = good.replace("urlsets: ['seta']", "urlsets: ['nope']")
    val e = intercept[ConfigLoader.ConfigError](ConfigLoader.load(bad))
    assert(e.getMessage.contains("nope"))
  }

  test("empty urlset is a config error") {
    intercept[ConfigLoader.ConfigError](
      ConfigLoader.load("urlsets:\n  empty: []\n"))
  }

  test("invalid urlset url is a config error (validator.py semantics)") {
    val bad = good.replace("https://a.com/b", "not a url")
    val e = intercept[ConfigLoader.ConfigError](ConfigLoader.load(bad))
    assert(e.getMessage.contains("invalid url"))
    // the reference regex's accepts/rejects
    assert(Validation.validUrl("http://localhost:8080/x"))
    assert(Validation.validUrl("https://sub.example.co.uk/path?q=1"))
    assert(Validation.validUrl("https://127.0.0.1/"))
    assert(!Validation.validUrl("ftp://example.com/"))
    assert(!Validation.validUrl("https://"))
    assert(Validation.validEmail("a.b+c@ex-ample.org"))
    assert(!Validation.validEmail("not-an-email"))
    assert(!Validation.validEmail("x@y"))
  }

  test("module declaration order is preserved") {
    val yaml =
      """aggregations:
        |  m1:
        |    cron: '0 0 * * *'
        |  m2:
        |    cron: '0 1 * * *'
        |  m3:
        |    cron: '0 2 * * *'
        |  m4:
        |    cron: '0 3 * * *'
        |  m5:
        |    cron: '0 4 * * *'
        |""".stripMargin
    assert(ConfigLoader.load(yaml).aggregations.map(_.module) ===
      Seq("m1", "m2", "m3", "m4", "m5"))
  }

  test("content hash changes with content") {
    assert(ConfigLoader.load(good).hash !==
      ConfigLoader.load(good + "\n# comment").hash)
  }
}
