package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class XPathSourceSpec extends SparkSpec {
  import spark.implicits._

  private val page =
    """<html><body><h2>First heading</h2><h2>Second one here</h2></body></html>"""

  private def staged(op: XPathSource.ElementOp) =
    XPathSource.stage(spark,
      Seq(ConfigUrl("set1", "https://ex.com/a"),
          ConfigUrl("set1", "https://ex.com/missing")),
      new FixtureFetcher(Map(
        "https://ex.com/a" -> FetchResult("https://ex.com/a", 200,
          Map("content-type" -> "text/html"), page))),
      cluster = "c1", name = "headings", query = "//h2/text()", op = op,
      now = () => java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))

  test("stage fetches, filters non-200, evaluates xpath into elements") {
    val out = staged(XPathSource.OpWordcount)
    assert(out.count() === 1, "404 page filtered out")
    val row = out.head()
    assert(row.getAs[String]("url") === "https://ex.com/a")
    assert(row.getAs[String]("cluster") === "c1")
    val elems = row.getSeq[org.apache.spark.sql.Row](
      row.fieldIndex("elements")).toSeq
    assert(elems.map(_.getAs[String]("content")) ===
      Seq("First heading", "Second one here"))
    assert(elems.map(_.getAs[String]("result")) === Seq("2", "3"))
    assert(elems.head.getAs[String]("operation") === "wordcount")
  }

  test("element operations: null, length, regex_count, regex_match") {
    def results(op: XPathSource.ElementOp): Seq[String] =
      staged(op).select(explode(col("elements")).as("e"))
        .select("e.result").as[String].collect().toSeq
    assert(results(XPathSource.OpNull) === Seq(null, null))
    assert(results(XPathSource.OpLength) === Seq("13", "15"))
    assert(results(XPathSource.OpRegexCount("[A-Za-z]+")) === Seq("2", "3"))
    assert(results(XPathSource.OpRegexMatch("[A-Z]\\w+", separator = "|"))
      === Seq("First", "Second"))
  }

  test("regex_match with capture-group tuples renders (a),(b)") {
    val out = staged(XPathSource.OpRegexMatch("(\\w+) (\\w+)", ",", groups = 2))
      .select(explode(col("elements")).as("e"))
      .select("e.result").as[String].collect().toSeq
    assert(out === Seq("(First),(heading)", "(Second),(one)"))
  }
}
