package graft.sources

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Url
import graft.functions.TextFunctions

/** One configured URL to pull (the unit of the reference's URL-set). */
final case class ConfigUrl(urlset: String, url: String, render: Boolean = false)

/** Staged html_parser document — field-for-field the reference's staging
  * doc (/root/reference/modules/aggregation/custom/html_parser.py:105-117),
  * minus the Mongo-only configuration_hash (config identity is carried by
  * the staging path here). */
final case class HtmlDoc(
    urlset: String,
    url: Url,
    status_code: Int,
    num_redirects: Int,
    redirects: Seq[Hop],
    ttfb: Double,
    body: String,
    rendered: Boolean,
    date: Timestamp,
    headers: Map[String, String])

/** Staged robots.txt document (robotstxt.py:51-62). */
final case class RobotsDoc(
    urlset: String,
    url: Url,
    status_code: Int,
    body: String,
    headers: Map[String, String],
    date: Timestamp)

/** S1 html_parser: fetch each configured URL and stage the response.
  *
  * The reference runs a thread per URL (html_parser.py:46-60); here the
  * URL list becomes a Dataset repartitioned to `maxConcurrency` slots and
  * the fetch runs inside `mapPartitions` — the same parallelism contract
  * (an API/politeness bound, NOT cluster width) expressed in Spark's
  * execution model. NOT a Catalyst data source: fetching is side-effecting,
  * so it stays an explicit source stage at the edge of the plan.
  */
object HtmlParserSource {
  val DefaultUserAgent =
    "Mozilla/5.0 (compatible; graft/0.1; +https://example.invalid/bot)"

  def stage(spark: SparkSession, urls: Seq[ConfigUrl], fetcher: Fetcher,
            userAgent: String = DefaultUserAgent,
            maxConcurrency: Int = 8,
            now: () => Timestamp = () => new Timestamp(System.currentTimeMillis()),
            renderer: Option[Renderer] = None): DataFrame = {
    import spark.implicits._
    val slots = math.max(1, math.min(urls.size, maxConcurrency))
    val ds: Dataset[ConfigUrl] = spark.createDataset(urls).repartition(slots)
    ds.mapPartitions { it =>
      it.map { cu =>
        val r = fetcher.fetch(cu.url, userAgent)
        val contentType = r.headers.collectFirst {
          case (k, v) if k.equalsIgnoreCase("content-type") => v
        }.getOrElse("")
        val body =
          if (r.error.nonEmpty) s"Error: ${r.error}"
          else if (contentType.startsWith("text/html")) {
            // render option (html_parser.py:91-94): status/headers/ttfb
            // come from the RAW request; only the body is replaced by the
            // headless-browser DOM. Requesting render without a renderer
            // reproduces the reference's error-body failure mode.
            if (cu.render)
              renderer.map(_.render(cu.url)).getOrElse(Renderer.NotConfigured)
            else r.body
          }
          else "Can't use content-type \"" + contentType + "\" for parsing"
        HtmlDoc(cu.urlset, parseUrl(cu.url),
          status_code = if (r.error.nonEmpty) 0 else r.status_code,
          num_redirects = math.max(0, r.redirects.size - 1),
          redirects = r.redirects,
          ttfb = r.ttfb, body = body, rendered = cu.render,
          date = now(), headers = if (r.error.nonEmpty) Map.empty else r.headers)
      }
    }.toDF()
  }

  private[sources] def parseUrl(url: String): Url = {
    val m = "^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?]*)([^?]*)\\??(.*)$".r
    url match {
      case m(proto, host, path, query) => Url(proto.toLowerCase, host, path, query)
      case _ => Url("", "", url, "")
    }
  }
}

/** S2 robotstxt: normalize each URL to its robots.txt location
  * (`<proto>://<domain><path rstrip '/'>/robots.txt`, robotstxt.py:25-28)
  * then fetch and stage. */
object RobotstxtSource {
  def stage(spark: SparkSession, urls: Seq[ConfigUrl], fetcher: Fetcher,
            userAgent: String = HtmlParserSource.DefaultUserAgent,
            maxConcurrency: Int = 8,
            now: () => Timestamp = () => new Timestamp(System.currentTimeMillis())): DataFrame = {
    import spark.implicits._
    val slots = math.max(1, math.min(urls.size, maxConcurrency))
    spark.createDataset(urls).repartition(slots).mapPartitions { it =>
      it.map { cu =>
        val u = HtmlParserSource.parseUrl(cu.url)
        val robotsUrl =
          if (cu.url.endsWith("/robots.txt")) cu.url
          else s"${u.protocol}://${u.domain}${u.path.reverse.dropWhile(_ == '/').reverse}/robots.txt"
        val r = fetcher.fetch(robotsUrl, userAgent)
        RobotsDoc(cu.urlset, HtmlParserSource.parseUrl(robotsUrl),
          status_code = if (r.error.nonEmpty) 0 else r.status_code,
          body = if (r.error.nonEmpty) s"Error: ${r.error}" else r.body,
          headers = r.headers, date = now())
      }
    }.toDF()
  }
}

/** S12 xpath: fetch pages (200 + text/html only, xpath.py:304-319),
  * evaluate an XPath query per page with Spark's built-in `xpath()` (the
  * reference serializes element children via lxml; `xpath()` yields node
  * text — equivalent for the text-bearing queries the ops consume), then
  * apply the per-element operation and emit the reference's output shape
  * {url, cluster, name, query, date, elements: array<struct{content,
  * operation, result}>} (xpath.py:329-340). */
object XPathSource {

  sealed trait ElementOp { def name: String }
  case object OpNull extends ElementOp { val name = "null" }
  case object OpLength extends ElementOp { val name = "length" }
  case object OpWordcount extends ElementOp { val name = "wordcount" }
  final case class OpRegexCount(pattern: String) extends ElementOp { val name = "regex_count" }
  /** findall joined by `separator`; capture-group tuples render "(a),(b)"
    * (xpath.py:236-279). */
  final case class OpRegexMatch(pattern: String, separator: String = ",",
                                groups: Int = 0) extends ElementOp {
    val name = "regex_match"
  }

  def opResult(op: ElementOp, e: Column): Column = op match {
    case OpNull => lit(null).cast("string")
    case OpLength => length(e).cast("string")
    case OpWordcount =>
      TextFunctions.wordCount(TextFunctions.stripHtml(e)).cast("string")
    case OpRegexCount(p) =>
      size(regexp_extract_all(e, lit(p), lit(0))).cast("string")
    case OpRegexMatch(p, sep, 0) =>
      array_join(regexp_extract_all(e, lit(p), lit(0)), sep)
    case OpRegexMatch(p, sep, 1) =>
      array_join(regexp_extract_all(e, lit(p), lit(1)), sep)
    case OpRegexMatch(p, sep, n) =>
      // tuple rendering "(g1),(g2)": zip the per-group extractions
      val zipped = arrays_zip((1 to n).map(g =>
        regexp_extract_all(e, lit(p), lit(g)).as(s"g$g")): _*)
      array_join(transform(zipped, t =>
        concat(lit("("),
          concat_ws("),(", (1 to n).map(g => t.getField(s"g$g")): _*),
          lit(")"))), sep)
  }

  def stage(spark: SparkSession, urls: Seq[ConfigUrl], fetcher: Fetcher,
            cluster: String, name: String, query: String, op: ElementOp,
            userAgent: String = HtmlParserSource.DefaultUserAgent,
            maxConcurrency: Int = 8,
            now: () => Timestamp = () => new Timestamp(System.currentTimeMillis())): DataFrame = {
    val fetched = HtmlParserSource.stage(spark, urls, fetcher, userAgent,
      maxConcurrency, now)
      .filter(col("status_code") === 200)
    // The XML-validity guard lives INSIDE the xpath expression: Catalyst's
    // generator pushdown can re-order evaluation past the status filter,
    // so a separate filter does not protect the parser from non-XML
    // bodies (404 pages, API errors) — an inline IF does, wherever the
    // expression ends up in the plan.
    val q = query.replace("'", "\\'")
    val elems = expr(
      s"xpath(IF(status_code = 200 AND body RLIKE '^\\\\s*<', body, '<x/>'), '$q')")
    fetched.select(
      Url.render(col("url")).as("url"),
      lit(cluster).as("cluster"),
      lit(name).as("name"),
      lit(query).as("query"),
      col("date"),
      transform(elems, e => struct(
        e.as("content"),
        lit(op.name).as("operation"),
        opResult(op, e).as("result"))).as("elements"))
  }
}
