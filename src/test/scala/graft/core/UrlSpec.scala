package graft.core

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Url struct round-trip vs /root/reference/utilities/url.py:4-17.
  * Property-style via raw ScalaCheck generators (deterministic seeds). */
class UrlSpec extends SparkSpec {
  import spark.implicits._

  private val genUrl: Gen[Url] = for {
    proto <- Gen.oneOf("http", "https")
    host <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(12))
    tld <- Gen.oneOf("com", "org", "de")
    pathSegs <- Gen.listOf(Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(8)))
    q <- Gen.oneOf(Gen.const(""), Gen.nonEmptyListOf(Gen.alphaNumChar).map("k=" + _.mkString.take(6)))
  } yield Url(proto, s"$host.$tld",
    if (pathSegs.isEmpty) "" else pathSegs.mkString("/", "/", ""), q)

  test("render/parse round-trip (property, 40 seeded samples)") {
    val params = Gen.Parameters.default
    val urls = (1 to 40).map(i => genUrl.pureApply(params, Seed(i.toLong)))
    val df = urls.map(_.render).toDF("url")
    val rows = df.select(Url.parse(col("url")).as("u")).select("u.*").collect()
    urls.zip(rows).foreach { case (u, row) =>
      assert(row.getString(0) === u.protocol, s"protocol of ${u.render}")
      assert(row.getString(1) === u.domain, s"domain of ${u.render}")
      assert(row.getString(2) === u.path, s"path of ${u.render}")
      assert(row.getString(3) === u.query, s"query of ${u.render}")
    }
  }

  test("column render is inverse of column parse") {
    val urls = Seq(
      "https://example.com/a/b?x=1",
      "http://sub.example.org/",
      "https://example.de/path",
      "https://example.com")
    val df = urls.toDF("url")
    val out = df.select(Url.render(Url.parse(col("url"))).as("r"))
      .collect().map(_.getString(0)).toSeq
    // bare-domain URLs normalize to empty path; others round-trip exactly
    assert(out === Seq(
      "https://example.com/a/b?x=1",
      "http://sub.example.org/",
      "https://example.de/path",
      "https://example.com"))
  }

  test("robots.txt path normalization (robotstxt.py:25-28)") {
    // <proto>://<domain><path rstrip '/'>/robots.txt
    val df = Seq(
      "https://example.com/sub/",
      "https://example.com/sub",
      "https://example.com/").toDF("url")
    val u = Url.parse(col("url"))
    val robots = concat(u.getField("protocol"), lit("://"), u.getField("domain"),
      regexp_replace(u.getField("path"), "/+$", ""), lit("/robots.txt"))
    val out = df.select(robots.as("r")).collect().map(_.getString(0)).toSeq
    assert(out === Seq(
      "https://example.com/sub/robots.txt",
      "https://example.com/sub/robots.txt",
      "https://example.com/robots.txt"))
  }
}
