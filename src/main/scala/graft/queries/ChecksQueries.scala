package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Tables => T, Url}
import graft.functions.{CheckDsl, DateFunctions, HtmlFunctions, TextFunctions}
import graft.operators.{Checks, Dedup, Lookup, Relational, Similarity}
import graft.operators.Checks.Spec
import Catalog.QueryDef

/** Check-framework tier: the C-family check catalogs, xpath ops,
  * enrichment, and alerting queries over synthesized page content.
  * Oracle-parity rules live in [[Catalog]]'s scaladoc. */
private[queries] object ChecksQueries {
  import Catalog._

  val defs: Seq[QueryDef] = Seq(

    // ===== C1-C6: metatags/htmlheadings check families over staged HTML =====
    QueryDef("q10_metatag_checks",
      (s, dir) => {
        val staged = T.documents(s, dir).select(col("doc_id"), syntheticHtml.as("html"))
        val titles = HtmlFunctions.titles(col("html"))
        val first = HtmlFunctions.firstTitle(col("html"))
        val nTitles = HtmlFunctions.titleCount(col("html"))
        val descs = HtmlFunctions.metaDescriptions(col("html"))
        val canon = HtmlFunctions.canonical(col("html"))
        val h1s = HtmlFunctions.h1Count(col("html"))
        Checks.run(staged, Seq(
          Spec("metatags-has_title", nTitles >= 1 && first =!= "", first,
            error = when(nTitles === 0, lit("title missing")).otherwise(lit(""))),
          Spec("metatags-has_multiple_titles", nTitles <= 1, nTitles.cast("string")),
          Spec("metatags-is_title_empty", !(nTitles >= 1 && first === ""), first),
          Spec("metatags-has_description", size(descs) >= 1,
            coalesce(element_at(descs, 1), lit(""))),
          Spec("metatags-has_canonical", canon =!= "", canon),
          Spec("htmlheadings-count_headline_h1", h1s === 1, h1s.cast("string"),
            error = when(h1s > 1, lit("more than one h1")).otherwise(lit("")))),
          Seq("doc_id"))
      },
      Some(s"""
        WITH staged AS (SELECT doc_id, $duckHtml AS html FROM documents),
        x AS (SELECT doc_id,
               regexp_extract_all(html, '(?is)<title[^>]*>(.*?)</title>', 1) AS titles,
               len(regexp_extract_all(html, '(?is)<title[^>]*>(.*?)</title>', 1)) AS n_titles,
               regexp_extract_all(html, '<meta name="description" content="([^"]*)">', 1) AS descs,
               coalesce(list_extract(regexp_extract_all(html, '<link rel="canonical" href="([^"]*)">', 1), 1), '') AS canon,
               len(regexp_extract_all(html, '(?is)<h1[\\s>]', 0)) AS h1s
              FROM staged),
        y AS (SELECT *, coalesce(trim(list_extract(titles, 1)), '') AS first_title FROM x)
        SELECT doc_id, 'metatags-has_title' AS "check",
               n_titles >= 1 AND first_title != '' AS valid, first_title AS value,
               '' AS diff, CASE WHEN n_titles = 0 THEN 'title missing' ELSE '' END AS error FROM y
        UNION ALL SELECT doc_id, 'metatags-has_multiple_titles',
               n_titles <= 1, CAST(n_titles AS VARCHAR), '', '' FROM y
        UNION ALL SELECT doc_id, 'metatags-is_title_empty',
               NOT (n_titles >= 1 AND first_title = ''), first_title, '', '' FROM y
        UNION ALL SELECT doc_id, 'metatags-has_description',
               len(descs) >= 1, coalesce(list_extract(descs, 1), ''), '', '' FROM y
        UNION ALL SELECT doc_id, 'metatags-has_canonical',
               canon != '', canon, '', '' FROM y
        UNION ALL SELECT doc_id, 'htmlheadings-count_headline_h1',
               h1s = 1, CAST(h1s AS VARCHAR), '',
               CASE WHEN h1s > 1 THEN 'more than one h1' ELSE '' END FROM y""")),

    // ===== S2/C8: robots.txt sitemap extraction =====
    QueryDef("q11_robots_sitemaps",
      (s, dir) => {
        val body = concat(
          lit("User-agent: *\nDisallow: /private\n"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit("Sitemap: https://example.com/"), col("source"),
              lit("/sitemap.xml\n"))).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(6)) === 0,
            lit("sitemap: https://example.com/extra.xml\n")).otherwise(lit("")))
        T.documents(s, dir).select(col("doc_id"), body.as("body"))
          .select(col("doc_id"),
            explode(HtmlFunctions.robotsSitemaps(col("body"))).as("sitemap"))
      },
      Some("""
        WITH b AS (SELECT doc_id,
          'User-agent: *' || chr(10) || 'Disallow: /private' || chr(10) ||
          CASE WHEN doc_id % 3 = 0
               THEN 'Sitemap: https://example.com/' || source || '/sitemap.xml' || chr(10)
               ELSE '' END ||
          CASE WHEN doc_id % 6 = 0
               THEN 'sitemap: https://example.com/extra.xml' || chr(10)
               ELSE '' END AS body FROM documents)
        SELECT doc_id,
               unnest(regexp_extract_all(body, '(?im)^\s*sitemap:\s*(\S+)', 1)) AS sitemap
        FROM b""")),

    // ===== S12: xpath element extraction + per-element operations =====
    QueryDef("q38_xpath_ops",
      (s, dir) => {
        import graft.sources.XPathSource
        val body = concat(lit("<doc><t>"), substring(col("text"), 1, 50),
          lit("</t><t>"), col("source"), lit("</t></doc>"))
        T.documents(s, dir).select(col("doc_id"), body.as("body"))
          .select(col("doc_id"),
            explode(expr("xpath(body, '/doc/t/text()')")).as("element"))
          .withColumn("wc",
            XPathSource.opResult(XPathSource.OpWordcount, col("element")))
          .withColumn("rc",
            XPathSource.opResult(XPathSource.OpRegexCount("[a-z]+"), col("element")))
      },
      Some("""
        WITH b AS (SELECT doc_id,
            '<doc><t>' || substr(text, 1, 50) || '</t><t>' || source || '</t></doc>' AS body
          FROM documents),
        e AS (SELECT doc_id,
            unnest(regexp_extract_all(body, '<t>(.*?)</t>', 1)) AS element
          FROM b),
        st AS (SELECT doc_id, element,
          trim(regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(
                    regexp_replace(element, '(?is)<script\b.*?</script>', ' ', 'g'),
                    '(?is)<style\b.*?</style>', ' ', 'g'),
                  '(?is)<svg\b.*?</svg>', ' ', 'g'),
                '(?is)<noscript\b.*?</noscript>', ' ', 'g'),
              '(?s)<[^>]*>', ' ', 'g'),
            '\s+', ' ', 'g')) AS stripped
          FROM e)
        SELECT doc_id, element,
          CAST(len(list_filter(string_split_regex(stripped, '\s+'),
               w -> len(w) > 1 AND regexp_matches(w, '[a-zA-Z]'))) AS VARCHAR) AS wc,
          CAST(len(regexp_extract_all(element, '[a-z]+', 0)) AS VARCHAR) AS rc
        FROM st""")),

    // ===== GSC matching enrichment (regex template + csv lookup) =====
    QueryDef("q39_enrichment",
      (s, dir) => {
        import graft.plans.Enrichment
        import graft.plans.Enrichment._
        val df = T.customer(s, dir)
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
            col("c_acctbal"))
        Enrichment.enrich(df, Seq("c_acctbal"), Seq(
          MatchRule("c_mktsegment", "segment_class", "other", Seq(
            CsvExpr(Seq(
              "retail" -> Seq("HOUSEHOLD", "FURNITURE"),
              "industry" -> Seq("MACHINERY", "BUILDING"),
              "auto" -> Seq("AUTOMOBILE"))))),
          MatchRule("c_name", "cust_id", "none", Seq(
            RegexExpr("^Customer#0*(\\d+)$", "id-$1")))))
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment,
          CASE WHEN c_mktsegment LIKE '%AUTOMOBILE%' THEN 'auto'
               WHEN c_mktsegment LIKE '%MACHINERY%'
                 OR c_mktsegment LIKE '%BUILDING%' THEN 'industry'
               WHEN c_mktsegment LIKE '%HOUSEHOLD%'
                 OR c_mktsegment LIKE '%FURNITURE%' THEN 'retail'
               ELSE 'other' END AS segment_class,
          CASE WHEN regexp_matches(c_name, '^Customer#0*(\d+)$')
               THEN 'id-' || regexp_extract(c_name, '^Customer#0*(\d+)$', 1)
               ELSE 'none' END AS cust_id
        FROM customer""")),

    // ===== S10: whole-result alert mode =====
    QueryDef("q25_count_alert",
      (s, dir) => Checks.countAlert(
        T.orders(s, dir).filter(col("o_totalprice") > 400000)),
      Some("""
        SELECT count(*) AS results_count, count(*) > 0 AS alert
        FROM orders WHERE o_totalprice > 400000""")),

    // ===== C5: responseheader check family over synthesized headers =====
    QueryDef("q53_responseheader_checks",
      (s, dir) => {
        val staged = T.documents(s, dir).select(
          col("source").as("urlset"),
          concat(lit("https://example.com/"), col("doc_id")).as("url"),
          lit("2024-01-01").as("date"),
          when(pmod(col("doc_id"), lit(5)) === 0, 404).otherwise(200)
            .as("status_code"),
          map(
            lit("Content-Encoding"),
            when(pmod(col("doc_id"), lit(2)) === 0, lit("gzip")).otherwise(lit("br")),
            lit("Cache-Control"),
            when(pmod(col("doc_id"), lit(3)) === 0, lit("No-Cache"))
              .otherwise(lit("max-age=3600"))).as("headers"))
        graft.plans.CheckCatalog.responseHeaders(staged, Map(
          "status_code" -> "200",
          "content_encoding" -> "gzip",
          "cache_control" -> "no-cache",
          "expires" -> "-1")) // never present → exercises the missing branch
      },
      Some("""
        WITH s AS (SELECT source AS urlset,
            'https://example.com/' || doc_id AS url,
            '2024-01-01' AS created,
            CASE WHEN doc_id % 5 = 0 THEN 404 ELSE 200 END AS status_code,
            CASE WHEN doc_id % 2 = 0 THEN 'gzip' ELSE 'br' END AS enc,
            CASE WHEN doc_id % 3 = 0 THEN 'No-Cache' ELSE 'max-age=3600' END AS cc
          FROM documents)
        SELECT urlset, 'responseheader-status_code' AS "check", '' AS value,
               status_code = 200 AS valid, '' AS diff, '' AS error,
               url, created FROM s
        UNION ALL SELECT urlset, 'responseheader-content_encoding', '',
               lower(enc) = 'gzip', '', '', url, created FROM s
        UNION ALL SELECT urlset, 'responseheader-cache_control', '',
               lower(cc) = 'no-cache', '', '', url, created FROM s
        UNION ALL SELECT urlset, 'responseheader-expires', '',
               FALSE, '', '', url, created FROM s""")),

    // ===== C7: pagespeed threshold family over synthesized Lighthouse
    // JSON (score mode >= on desktop, display mode <= on mobile) =====
    QueryDef("q54_pagespeed_checks",
      (s, dir) => {
        val scoreTxt = concat(lit("0."),
          lpad(pmod(col("doc_id"), lit(100)).cast("string"), 2, "0"))
        val nvTxt = pmod(col("doc_id"), lit(5000)).cast("string")
        val audits = concat(
          lit(""","audits":{"first-contentful-paint":{"score":"""), scoreTxt,
          lit(""","numericValue":"""), nvTxt, lit("}}"))
        val body = concat(
          lit("""{"lighthouseResult":{"categories":{"performance":{"score":"""),
          scoreTxt, lit("}}"),
          when(pmod(col("doc_id"), lit(10)) =!= 0, audits).otherwise(lit("")),
          lit("}}"))
        val staged = T.documents(s, dir).select(
          col("source").as("urlset"),
          concat(lit("https://example.com/"), col("doc_id")).as("url"),
          lit("2024-01-01").as("date"),
          when(pmod(col("doc_id"), lit(2)) === 0, "desktop").otherwise("mobile")
            .as("strategy"),
          body.as("body"))
        graft.plans.CheckCatalog.pagespeedThreshold(staged,
            "performance_score_", "performance", "desktop", 0.5)
          .unionByName(graft.plans.CheckCatalog.pagespeedThreshold(staged,
            "fcp_display_", "first-contentful-paint", "mobile", 3000.0,
            displayMode = true))
      },
      Some("""
        WITH s AS (SELECT source AS urlset,
            'https://example.com/' || doc_id AS url,
            '2024-01-01' AS created,
            doc_id % 2 = 0 AS is_desktop,
            CAST('0.' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS DOUBLE) AS score,
            CASE WHEN doc_id % 10 = 0 THEN NULL
                 ELSE CAST(doc_id % 5000 AS DOUBLE) END AS nv
          FROM documents)
        SELECT urlset, 'pagespeed-performance_score_desktop' AS "check",
               coalesce(CAST(score AS VARCHAR), '') AS value,
               coalesce(score >= 0.5, FALSE) AS valid, '' AS diff,
               CASE WHEN score IS NULL THEN 'audit missing' ELSE '' END AS error,
               url, created
        FROM s WHERE is_desktop
        UNION ALL
        SELECT urlset, 'pagespeed-fcp_display_mobile',
               coalesce(CAST(nv AS VARCHAR), ''),
               coalesce(nv <= 3000.0, FALSE), '',
               CASE WHEN nv IS NULL THEN 'audit missing' ELSE '' END,
               url, created
        FROM s WHERE NOT is_desktop""")),

    // ===== P2/S10: comparison-DSL per-row alert mode =====
    QueryDef("q32_check_dsl_alerts",
      (s, dir) => T.events(s, dir)
        .withColumn("ok", CheckDsl.compile("{value} >= 50"))
        .withColumn("is_error", CheckDsl.compile("{event_type} == error"))
        .filter(!col("ok") || col("is_error"))
        .select(col("event_id"), col("value"), col("event_type"),
          col("ok"), col("is_error")),
      Some("""
        SELECT event_id, value, event_type,
               value >= 50 AS ok, event_type = 'error' AS is_error
        FROM events
        WHERE NOT (value >= 50) OR event_type = 'error'""")),
  )

  /** Synthesized per-doc HTML used by the check-family queries — variation
    * by doc_id covers every branch of each check (missing/empty/multiple
    * titles, present/missing description and canonical, 1 vs 2 h1s). */
  private def syntheticHtml: Column = concat(
    lit("<html><head>"),
    when(pmod(col("doc_id"), lit(7)) === 0, lit(""))
      .when(pmod(col("doc_id"), lit(7)) === 1, lit("<title></title>"))
      .when(pmod(col("doc_id"), lit(7)) === 2,
        concat(lit("<title>"), col("source"), lit("</title><title>dup</title>")))
      .otherwise(concat(lit("<title> "), col("source"), lit(" page </title>"))),
    when(pmod(col("doc_id"), lit(3)) === 0,
      concat(lit("<meta name=\"description\" content=\""), col("lang"), lit("\">")))
      .otherwise(lit("")),
    when(pmod(col("doc_id"), lit(5)) === 0, lit(""))
      .otherwise(concat(lit("<link rel=\"canonical\" href=\"https://example.com/d/"),
        col("doc_id"), lit("\">"))),
    lit("</head><body>"),
    when(pmod(col("doc_id"), lit(4)) === 0, lit("<h1>A</h1><h1>B</h1>"))
      .otherwise(lit("<h1>A</h1>")),
    lit("</body></html>"))

  /** DuckDB mirror of [[syntheticHtml]]. */
  private def duckHtml: String =
    """'<html><head>' ||
       CASE WHEN doc_id % 7 = 0 THEN ''
            WHEN doc_id % 7 = 1 THEN '<title></title>'
            WHEN doc_id % 7 = 2 THEN '<title>' || source || '</title><title>dup</title>'
            ELSE '<title> ' || source || ' page </title>' END ||
       CASE WHEN doc_id % 3 = 0
            THEN '<meta name="description" content="' || lang || '">'
            ELSE '' END ||
       CASE WHEN doc_id % 5 = 0 THEN ''
            ELSE '<link rel="canonical" href="https://example.com/d/' || doc_id || '">' END ||
       '</head><body>' ||
       CASE WHEN doc_id % 4 = 0 THEN '<h1>A</h1><h1>B</h1>' ELSE '<h1>A</h1>' END ||
       '</body></html>'"""
}
