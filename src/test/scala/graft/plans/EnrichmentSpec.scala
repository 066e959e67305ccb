package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.plans.Enrichment._

class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  private def pages = Seq(
    ("2024-01-01", "https://www.property.com/pathone/somesite.html", 10),
    ("2024-01-01", "https://www.property.com/pathtwo/somesite.html", 20),
    ("2024-01-01", "https://other.com/x.html", 30)
  ).toDF("date", "page", "clicks")

  test("excludeInputFields drops columns but never date") {
    val out = enrich(pages, Seq("clicks", "date"), Nil)
    assert(out.columns.toSeq === Seq("date", "page"))
  }

  test("csv lookup: LAST matching column wins, fallback fills the rest") {
    val rule = MatchRule("page", "path_class", "unknown", Seq(
      CsvExpr(Seq(
        "one" -> Seq("/pathone/"),
        "site" -> Seq("somesite"), // also matches rows 1+2 → overwrites "one"
        "two" -> Seq("/pathtwo/")))))
    val out = enrich(pages, Nil, Seq(rule))
      .select("page", "path_class").as[(String, String)].collect().toMap
    assert(out("https://www.property.com/pathone/somesite.html") === "site")
    assert(out("https://www.property.com/pathtwo/somesite.html") === "two",
      "later csv column overwrites the earlier match")
    assert(out("https://other.com/x.html") === "unknown")
  }

  test("regex template with group substitution and missing-group literal") {
    val rule = MatchRule("page", "path", "", Seq(
      RegexExpr("""https://[^/]+/([a-z]+)/""", "seg-$1-$9")))
    val out = enrich(pages, Nil, Seq(rule))
      .select("page", "path").as[(String, String)].collect().toMap
    assert(out("https://www.property.com/pathone/somesite.html") === "seg-pathone-$9")
    assert(out("https://other.com/x.html") === "", "no match, empty fallback")
  }

  test("case-insensitive and regex csv modes") {
    val df = Seq(("A", "Hello WORLD")).toDF("k", "v")
    val insensitive = enrich(df, Nil, Seq(MatchRule("v", "o", "n", Seq(
      CsvExpr(Seq("hit" -> Seq("world")), caseSensitive = false)))))
    assert(insensitive.select("o").head().getString(0) === "hit")
    val sensitive = enrich(df, Nil, Seq(MatchRule("v", "o", "n", Seq(
      CsvExpr(Seq("hit" -> Seq("world")), caseSensitive = true)))))
    assert(sensitive.select("o").head().getString(0) === "n")
    val rx = enrich(df, Nil, Seq(MatchRule("v", "o", "n", Seq(
      CsvExpr(Seq("hit" -> Seq("W.RLD")), useRegex = true)))))
    assert(rx.select("o").head().getString(0) === "hit")
  }

  test("loadMatchesCsv parses column-major with quoted cells") {
    val csv = """"TEST","F00"
      |"https://a.com/one.html","https://a.com/two.html"
      |"https://a.com/three.html","https://a.com/four.html"""".stripMargin
    val cols = loadMatchesCsv(csv)
    assert(cols.map(_._1) === Seq("TEST", "F00"))
    assert(cols.head._2 === Seq("https://a.com/one.html", "https://a.com/three.html"))
  }
}
