package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Tables => T, Url}
import graft.functions.{CheckDsl, DateFunctions, HtmlFunctions, TextFunctions}
import graft.operators.{Checks, Dedup, Lookup, Relational, Similarity}
import graft.operators.Checks.Spec

/** The driver-facing query inventory: one entry per implemented operator
  * from SURVEY.md §2 plus the LLM-data-pipeline tier, each paired with an
  * ANSI-SQL oracle the driver runs in DuckDB over the same parquet.
  *
  * Oracle-parity rules (learned the hard way, documented for future
  * queries):
  *  - column names must match exactly (the driver sorts columns by name
  *    before hashing) — alias everything on both sides, lowercase;
  *  - never hash a float that came out of an order-dependent aggregation:
  *    sums of 2-decimal money go through decimal(18,2) in BOTH engines
  *    (exact, order-independent), then cast to double;
  *  - scalar float math is fine IF the oracle mirrors the exact IEEE op
  *    order (same parenthesisation), since both engines use binary64;
  *  - timestamps are exported as epoch microseconds (bigint) — parquet
  *    NANOS vs MICROS physical types would otherwise compare unequal;
  *  - regexes must stay in the RE2-compatible subset (no backreferences)
  *    so Spark (Java regex) and DuckDB (RE2) agree;
  *  - DuckDB regexp_replace needs the 'g' flag to match Spark's
  *    replace-all default.
  */
object Catalog {

  final case class QueryDef(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  // ---------------------------------------------------------------- helpers

  /** Money-safe sum: exact decimal accumulation, double result. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Stopword list literal for DuckDB. */
  private def sqlList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  /** DuckDB mirror of TextFunctions.tokens. */
  private val duckToks =
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0)"

  /** DuckDB mirror of VectorFunctions.dot(a, b): left fold in index order
    * with 0.0 init — bit-identical to Spark's `aggregate`. */
  private def duckDot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1), " +
      s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), (x, y) -> x + y)"

  /** q42's hyperplane tables — one source of truth for the Spark query
    * AND the generated oracle SQL (integer coefficients, so both engines
    * compute identical sign bits). */
  private val q42Planes: Seq[Seq[Seq[Double]]] =
    (0 until 4).map(t =>
      graft.functions.VectorFunctions.latticePlanes(8, 64, 42L + t))

  private def duckL2(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1), " +
      s"i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE))), (x, y) -> x + y)"

  // ----------------------------------------------------------- definitions

  val defs: Seq[QueryDef] = Seq(

    // ===== A4/§2.5: flagship aggregation surface (TPC-H Q1 shape) =====
    QueryDef("q01_pricing_summary",
      (s, dir) => T.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)"))))
            .cast("double").as("sum_disc_price"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order")),
      Some("""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               sum(l_quantity) / count(*) AS avg_qty,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus""")),

    // ===== J2/W1: latest snapshot per key =====
    QueryDef("q02_latest_event",
      (s, dir) => Relational.latestSnapshot(
          T.events(s, dir), Seq("user_id"), "ts", Seq("event_id"))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"), col("value").as("last_value"),
          unix_micros(col("ts")).as("last_ts_us")),
      Some("""
        SELECT user_id, event_id AS last_event_id, event_type AS last_type,
               value AS last_value, epoch_us(ts) AS last_ts_us
        FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        WHERE rn = 1""")),

    // ===== J1: previous-period metric join =====
    QueryDef("q03_prev_day_revenue",
      (s, dir) => {
        val daily = T.orders(s, dir)
          .groupBy(to_date(col("o_orderdate")).as("order_date"),
            col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("revenue"))
        Relational.previousPeriodJoin(daily, Seq("o_orderpriority"),
          "order_date", Seq("n_orders", "revenue"),
          d => date_add(d, 1), suffix = "_prev")
      },
      Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS order_date, o_orderpriority,
                 count(*) AS n_orders,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          FROM orders GROUP BY 1, 2)
        SELECT c.o_orderpriority, c.order_date, c.n_orders, c.revenue,
               p.n_orders AS n_orders_prev, p.revenue AS revenue_prev
        FROM daily c LEFT JOIN daily p
          ON p.o_orderpriority = c.o_orderpriority
         AND c.order_date = p.order_date + 1""")),

    // ===== J3/I4: existence anti-join (idempotent append) =====
    QueryDef("q04_idempotent_filter",
      (s, dir) => {
        val orders = T.orders(s, dir)
        val sink = orders.filter(pmod(col("o_orderkey"), lit(10)) < 3)
        Relational.idempotentFilter(orders, sink, Seq("o_orderkey"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"), to_date(col("o_orderdate")).as("order_date"),
            col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               CAST(o_orderdate AS DATE) AS order_date, o_orderpriority
        FROM orders
        WHERE o_orderkey NOT IN
          (SELECT o_orderkey FROM orders WHERE o_orderkey % 10 < 3)""")),

    // ===== A1: duplicate detection with member diff =====
    QueryDef("q05_duplicate_brands",
      // member cap 100 exercised end-to-end: brand groups run to ~800
      // members, so the uncapped diff string is quadratic output weight
      // (group_size × rows); dup_count still reports the true size
      (s, dir) => Relational.duplicateValues(
          T.part(s, dir).select("p_partkey", "p_brand"), "p_partkey", "p_brand",
          maxMembers = 100)
        .select("p_partkey", "p_brand", "dup_count", "is_duplicate", "diff"),
      Some("""
        WITH m AS (SELECT p_brand, list_sort(list(p_partkey))[:100] AS mem,
                          count(*) AS dup_count
                   FROM part GROUP BY p_brand)
        SELECT p.p_partkey, p.p_brand, m.dup_count,
               m.dup_count > 1 AS is_duplicate,
               array_to_string(list_filter(m.mem, x -> x != p.p_partkey), ',') AS diff
        FROM part p JOIN m ON p.p_brand = m.p_brand""")),

    // ===== W1: top-k per group =====
    QueryDef("q06_topk_orders",
      (s, dir) => Relational.topKPerGroup(T.orders(s, dir),
          Seq("o_orderpriority"),
          Seq(desc("o_totalprice"), asc("o_orderkey")), 5)
        .select(col("o_orderpriority"), col("o_orderkey"),
          col("o_totalprice"), col("rank").cast("long").as("rank")),
      Some("""
        SELECT o_orderpriority, o_orderkey, o_totalprice, "rank" FROM (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
                 rank() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey) AS "rank"
          FROM orders)
        WHERE "rank" <= 5""")),

    // ===== J2: change detection via lag =====
    QueryDef("q07_value_change",
      (s, dir) => Relational.withPreviousValue(T.events(s, dir),
          Seq("user_id"), "ts", "value", "prev_value", Seq("event_id"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("value"), col("prev_value"),
          (!(col("value") <=> col("prev_value"))).as("changed")),
      Some("""
        SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
               lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
               value IS DISTINCT FROM
                 lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS changed
        FROM events""")),

    // ===== U1/I2: retry-queue work-list merge =====
    QueryDef("q08_merge_worklists",
      (s, dir) => {
        val orders = T.orders(s, dir)
        val fresh = orders.filter(col("o_orderdate") >= lit("2000-01-01"))
        val pending = orders.filter(pmod(col("o_orderkey"), lit(7)) === 0)
        Relational.mergeWorkLists(fresh, pending, Seq("o_orderkey"))
          .select(col("o_orderkey"), col("o_custkey"),
            to_date(col("o_orderdate")).as("order_date"), col("o_totalprice"))
      },
      Some("""
        SELECT DISTINCT o_orderkey, o_custkey,
               CAST(o_orderdate AS DATE) AS order_date, o_totalprice
        FROM (SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
              UNION ALL
              SELECT * FROM orders WHERE o_orderkey % 7 = 0)""")),

    // ===== S9/A4: SQL-as-source with named parameters =====
    QueryDef("q09_sql_named_params",
      (s, dir) => {
        T.registerAll(s, dir)
        s.sql(
          """SELECT o_orderpriority, count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             FROM orders WHERE o_totalprice > :minPrice
             GROUP BY o_orderpriority""",
          Map("minPrice" -> Int.box(150000)))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders WHERE o_totalprice > 150000
        GROUP BY o_orderpriority""")),

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

    // ===== F6: URL parse into struct =====
    QueryDef("q12_url_parse",
      (s, dir) => {
        val url = concat(lit("https://www."),
          lower(regexp_replace(col("p_brand"), "#", "")),
          lit(".example.com/parts/"), col("p_partkey"),
          when(pmod(col("p_partkey"), lit(2)) === 0,
            concat(lit("?size="), col("p_size"))).otherwise(lit("")))
        T.part(s, dir).select(col("p_partkey"), url.as("url"))
          .withColumn("u", Url.parse(col("url")))
          .select(col("p_partkey"), col("url"),
            col("u.protocol").as("protocol"), col("u.domain").as("domain"),
            col("u.path").as("path"), col("u.query").as("query"))
      },
      Some("""
        SELECT p_partkey,
          'https://www.' || lower(replace(p_brand, '#', '')) || '.example.com/parts/'
            || p_partkey ||
            CASE WHEN p_partkey % 2 = 0 THEN '?size=' || p_size ELSE '' END AS url,
          'https' AS protocol,
          'www.' || lower(replace(p_brand, '#', '')) || '.example.com' AS domain,
          '/parts/' || p_partkey AS path,
          CASE WHEN p_partkey % 2 = 0 THEN 'size=' || p_size ELSE '' END AS query
        FROM part""")),

    // ===== F8: JSON plucking + aggregation =====
    QueryDef("q13_json_pluck",
      (s, dir) => T.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), min("k").as("min_k"),
          max("k").as("max_k"), sum("k").as("sum_k")),
      Some("""
        SELECT event_type, count(*) AS n, min(k) AS min_k, max(k) AS max_k,
               CAST(sum(k) AS BIGINT) AS sum_k
        FROM (SELECT event_type,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events)
        GROUP BY event_type""")),

    // ===== S5: keys-list pivot to named dimensions =====
    QueryDef("q14_keys_pivot",
      (s, dir) => {
        val ks = split(col("p_name"), " ")
        T.part(s, dir).select(col("p_partkey"),
          element_at(ks, 1).as("dim1"), element_at(ks, 2).as("dim2"))
      },
      Some("""
        SELECT p_partkey, string_split(p_name, ' ')[1] AS dim1,
               string_split(p_name, ' ')[2] AS dim2
        FROM part""")),

    // ===== Text analysis: counts =====
    QueryDef("q15_text_stats",
      (s, dir) => T.documents(s, dir).select(col("doc_id"),
        TextFunctions.wordCount(col("text")).cast("long").as("n_words"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextFunctions.subwordCount(col("text")).cast("long").as("n_subwords")),
      Some(s"""
        SELECT doc_id,
          len(list_filter(string_split_regex(text, '\\s+'),
              w -> len(w) > 1 AND regexp_matches(w, '[a-zA-Z]'))) AS n_words,
          len($duckToks) AS n_tokens,
          len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)) AS n_subwords
        FROM documents""")),

    // ===== Text analysis: language ID =====
    QueryDef("q16_lang_id",
      (s, dir) => T.documents(s, dir).select(col("doc_id"),
        TextFunctions.langId(col("text")).as("lang_pred")),
      Some {
        val langs = TextFunctions.stopwords.toSeq.sortBy(_._1)
        val scores = langs.map { case (lang, words) =>
          s"len(list_filter(tk, t -> list_contains(${sqlList(words)}, t))) AS s_$lang"
        }.mkString(", ")
        val allZero = langs.map { case (l, _) => s"s_$l = 0" }.mkString(" AND ")
        val cases = langs.map { case (l, _) =>
          val geAll = langs.map { case (o, _) => s"s_$l >= s_$o" }.mkString(" AND ")
          s"WHEN $geAll THEN '$l'"
        }.mkString(" ")
        s"""
        WITH tks AS (SELECT doc_id, $duckToks AS tk FROM documents),
        sc AS (SELECT doc_id, $scores FROM tks)
        SELECT doc_id,
               CASE WHEN $allZero THEN 'und' $cases END AS lang_pred
        FROM sc"""
      }),

    // ===== Text analysis: quality score (exact IEEE mirror) =====
    QueryDef("q17_quality_score",
      (s, dir) => T.documents(s, dir).select(col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("q")),
      Some(s"""
        WITH x AS (SELECT doc_id,
            CAST(length(text) AS DOUBLE) AS len,
            CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
            CAST(len($duckToks) AS DOUBLE) AS ntok,
            CAST(len(list_filter($duckToks,
              t -> list_contains(${sqlList(TextFunctions.stopwords("en"))}, t))) AS DOUBLE) AS hits
          FROM documents)
        SELECT doc_id,
          ((CASE WHEN len > 0 THEN alpha / len ELSE 0.0 END
            + CASE WHEN ntok > 0 THEN hits / ntok ELSE 0.0 END)
            + least(len / 500.0, 1.0)) / 3.0 AS q
        FROM x""")),

    // ===== Text analysis: rolling-hash fingerprint =====
    QueryDef("q18_fingerprint",
      (s, dir) => T.documents(s, dir).select(col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp")),
      Some("""
        SELECT doc_id,
          list_reduce(
            list_prepend(CAST(0 AS BIGINT),
              list_transform(range(1, length(text) + 1),
                i -> CAST(ascii(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT))),
            (a, b) -> (a * 31 + b) % 1000000007) AS fp
        FROM documents""")),

    // ===== Dedup: exact (min-id keep) =====
    QueryDef("q19_dedup_exact",
      (s, dir) => Dedup.exact(
          T.documents(s, dir).withColumn("k", substring(col("text"), 1, 40)),
          "doc_id", "k")
        .select("doc_id", "k"),
      Some("""
        SELECT d.doc_id, substr(d.text, 1, 40) AS k
        FROM documents d
        JOIN (SELECT substr(text, 1, 40) AS kk, min(doc_id) AS mid
              FROM documents GROUP BY 1) g
          ON substr(d.text, 1, 40) = g.kk AND d.doc_id = g.mid""")),

    // ===== Dedup: exact groups =====
    QueryDef("q20_dup_groups",
      (s, dir) => Dedup.exactGroups(
          T.documents(s, dir).withColumn("k", substring(col("text"), 1, 20)),
          "doc_id", "k")
        .select(col("k"), col("dup_count"),
          array_join(transform(col("members"), m => m.cast("string")), ",")
            .as("members")),
      Some("""
        SELECT substr(text, 1, 20) AS k, count(*) AS dup_count,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS members
        FROM documents GROUP BY 1 HAVING count(*) > 1""")),

    // ===== Dedup: exact n-gram Jaccard pairs =====
    QueryDef("q21_jaccard_pairs",
      (s, dir) => Dedup.ngramJaccardPairs(T.documents(s, dir),
        "doc_id", "text", n = 3, threshold = 0.5, maxDocFreq = 100L),
      Some(s"""
        WITH tks AS (SELECT doc_id, $duckToks AS tk FROM documents),
        sh AS (SELECT doc_id, unnest(list_distinct(
                 CASE WHEN len(tk) = 0 THEN []::VARCHAR[]
                      WHEN len(tk) >= 3 THEN list_transform(range(1, len(tk) - 1),
                        i -> array_to_string(tk[i:i+2], ' '))
                      ELSE [array_to_string(tk, ' ')] END)) AS shingle
               FROM tks),
        flt AS (SELECT shingle FROM sh GROUP BY shingle
                HAVING count(*) >= 2 AND count(*) <= 100),
        fsh AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN flt USING (shingle)),
        sizes AS (SELECT doc_id, count(*) AS sz FROM fsh GROUP BY doc_id),
        pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
                  FROM fsh a JOIN fsh b
                    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT id_a, id_b,
               CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) AS jaccard
        FROM pairs
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) >= 0.5""")),

    // ===== Dedup: portable MinHash-LSH, oracle-verified end-to-end =====
    QueryDef("q34_minhash_pairs",
      (s, dir) => Dedup.minhashPortablePairs(T.documents(s, dir),
        "doc_id", "text", shingleN = 3, bands = 8, rowsPerBand = 2,
        threshold = 0.5, seed = 7L),
      Some {
        val coeffs = Dedup.universalCoeffs(16, 7L)
        val mins = coeffs.zipWithIndex.map { case ((a, b), i) =>
          s"list_min(list_transform(hv, x -> ($a * x + $b) % 1000000007)) AS m$i"
        }.mkString(",\n               ")
        val bandArms = (0 until 8).map { bnd =>
          val (r0, r1) = (bnd * 2, bnd * 2 + 1)
          s"SELECT doc_id, $bnd AS band, m$r0::VARCHAR || '_' || m$r1::VARCHAR AS bucket FROM m"
        }.mkString("\n          UNION ALL ")
        s"""
        WITH tks AS (SELECT doc_id, $duckToks AS tk FROM documents),
        sh AS (SELECT doc_id, list_distinct(
                 CASE WHEN len(tk) = 0 THEN []::VARCHAR[]
                      WHEN len(tk) >= 3 THEN list_transform(range(1, len(tk) - 1),
                        i -> array_to_string(tk[i:i+2], ' '))
                      ELSE [array_to_string(tk, ' ')] END) AS shingles
               FROM tks),
        nz AS (SELECT * FROM sh WHERE len(shingles) > 0),
        hs AS (SELECT doc_id, list_transform(shingles, s ->
                 list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, length(s) + 1),
                     i -> CAST(ascii(substr(s, CAST(i AS INTEGER), 1)) AS BIGINT))),
                   (a, b) -> (a * 31 + b) % 1000000007)) AS hv FROM nz),
        m AS (SELECT doc_id,
               $mins
              FROM hs),
        banded AS ($bandArms),
        groups AS (SELECT band, bucket, list_sort(list(doc_id)) AS ids
                   FROM banded GROUP BY 1, 2
                   HAVING count(*) >= 2 AND count(*) <= 1000),
        cand AS (SELECT DISTINCT p.id_a AS id_a, p.id_b AS id_b FROM groups,
          unnest(flatten(list_transform(range(1, len(ids) + 1), i ->
            list_transform(ids[i+1:], y -> {'id_a': ids[i], 'id_b': y})))) AS t(p)),
        sv AS (SELECT doc_id, list_distinct(hv) AS s FROM hs),
        j AS (SELECT c.id_a, c.id_b,
                CASE WHEN CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) = 0.0
                     THEN 0.0
                     ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                          / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) END AS jaccard
              FROM cand c
              JOIN sv a ON a.doc_id = c.id_a
              JOIN sv b ON b.doc_id = c.id_b)
        SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.5"""
      }),

    // ===== Dedup: portable SimHash, oracle-verified end-to-end =====
    QueryDef("q35_simhash_pairs",
      (s, dir) => Dedup.simhashPortablePairs(T.documents(s, dir),
        "doc_id", "text", maxDist = 3, seed = 7L)
        .withColumn("hamming", col("hamming").cast("long")),
      Some {
        val coeffs = Dedup.universalCoeffs(48, 7L)
        val bits = coeffs.zipWithIndex.map { case ((a, b), i) =>
          s"(CASE WHEN list_sum(list_transform(hv, x -> CASE WHEN ($a * x + $b) % 1000000007 % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN ${1L << i} ELSE 0 END)"
        }.mkString("\n               + ")
        val chunkArms = (0 until 4).map { c =>
          s"SELECT doc_id, sig, $c AS chunk, (sig >> ${c * 12}) & 4095 AS cval FROM sigs"
        }.mkString("\n          UNION ALL ")
        s"""
        WITH tks AS (SELECT doc_id, $duckToks AS tk FROM documents),
        nz AS (SELECT * FROM tks WHERE len(tk) > 0),
        hs AS (SELECT doc_id, list_transform(tk, t ->
                 list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, length(t) + 1),
                     i -> CAST(ascii(substr(t, CAST(i AS INTEGER), 1)) AS BIGINT))),
                   (a, b) -> (a * 31 + b) % 1000000007)) AS hv FROM nz),
        sigs AS (SELECT doc_id, CAST($bits AS BIGINT) AS sig FROM hs),
        chunked AS ($chunkArms),
        groups AS (SELECT chunk, cval,
                     list_sort(list({'id': doc_id, 'sig': sig})) AS ms
                   FROM chunked GROUP BY 1, 2
                   HAVING count(*) >= 2 AND count(*) <= 10000),
        cand AS (SELECT DISTINCT p.id_a AS id_a, p.id_b AS id_b,
                        p.hamming AS hamming FROM groups,
          unnest(flatten(list_transform(range(1, len(ms) + 1), i ->
            list_transform(ms[i+1:], y ->
              {'id_a': ms[i].id, 'id_b': y.id,
               'hamming': bit_count(xor(ms[i].sig, y.sig))})))) AS t(p))
        SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
        FROM cand WHERE hamming <= 3"""
      }),

    // ===== Similarity: exact brute-force top-k =====
    QueryDef("q22_brute_topk",
      (s, dir) => {
        val e = T.embeddings(s, dir)
        Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 8),
          "vec_id", "embedding", 5)
          .withColumn("rank", col("rank").cast("long"))
      },
      Some {
        val d = duckDot("qv", "cv")
        val na = s"sqrt(${duckDot("qv", "qv")})"
        val nb = s"sqrt(${duckDot("cv", "cv")})"
        s"""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                   FROM embeddings WHERE vec_id < 8),
        c AS (SELECT vec_id AS nbr_id, embedding AS cv FROM embeddings),
        scored AS (SELECT query_id, nbr_id,
            CASE WHEN $na = 0.0 OR $nb = 0.0 THEN 0.0
                 ELSE $d / ($na * $nb) END AS sim
          FROM c CROSS JOIN q WHERE nbr_id != query_id)
        SELECT query_id, nbr_id, sim, "rank" FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, nbr_id) AS "rank" FROM scored)
        WHERE "rank" <= 5"""
      }),

    // ===== Similarity: IVF-partitioned ANN =====
    QueryDef("q23_ivf_topk",
      (s, dir) => {
        val e = T.embeddings(s, dir)
        val cents = e.filter(col("vec_id") < 16)
          .select(col("vec_id").cast("int").as("cell"),
            col("embedding").cast("array<double>").as("cvec"))
        Similarity.ivfTopK(e, e.filter(col("vec_id") < 8),
          "vec_id", "embedding", 5, cents, nProbes = 2)
          .withColumn("rank", col("rank").cast("long"))
      },
      Some {
        val l2 = duckL2("e.embedding", "c.cvec")
        val d = duckDot("qv", "cv")
        val na = s"sqrt(${duckDot("qv", "qv")})"
        val nb = s"sqrt(${duckDot("cv", "cv")})"
        s"""
        WITH cents AS (SELECT CAST(vec_id AS INTEGER) AS cell,
                              embedding::DOUBLE[] AS cvec
                       FROM embeddings WHERE vec_id < 16),
        assigned AS (SELECT nbr_id, cv, cell FROM (
            SELECT e.vec_id AS nbr_id, e.embedding AS cv, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY $l2, c.cell) AS rn
            FROM embeddings e CROSS JOIN cents c)
          WHERE rn = 1),
        probed AS (SELECT query_id, qv, cell FROM (
            SELECT e.vec_id AS query_id, e.embedding AS qv, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY $l2, c.cell) AS rn
            FROM embeddings e CROSS JOIN cents c WHERE e.vec_id < 8)
          WHERE rn <= 2),
        scored AS (SELECT query_id, nbr_id,
            CASE WHEN $na = 0.0 OR $nb = 0.0 THEN 0.0
                 ELSE $d / ($na * $nb) END AS sim
          FROM assigned JOIN probed USING (cell)
          WHERE nbr_id != query_id)
        SELECT query_id, nbr_id, sim, "rank" FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, nbr_id) AS "rank" FROM scored)
        WHERE "rank" <= 5"""
      }),

    // ===== Similarity: label-blocked embedding near-dup pairs =====
    QueryDef("q24_embedding_neardup",
      (s, dir) => Similarity.labelBlockedNearDup(T.embeddings(s, dir),
        "label", "vec_id", "embedding", threshold = 0.35, maxBlock = 1000),
      Some {
        val d = duckDot("va", "vb")
        val na = s"sqrt(${duckDot("va", "va")})"
        val nb = s"sqrt(${duckDot("vb", "vb")})"
        s"""
        WITH e AS (SELECT label, vec_id, embedding FROM embeddings
                   QUALIFY row_number() OVER (PARTITION BY label
                                              ORDER BY vec_id) <= 1000)
        SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
               CASE WHEN $na = 0.0 OR $nb = 0.0 THEN 0.0
                    ELSE $d / ($na * $nb) END AS sim
        FROM (SELECT label, vec_id, embedding AS va FROM e) a
        JOIN (SELECT label, vec_id, embedding AS vb FROM e) b USING (label)
        WHERE a.vec_id < b.vec_id
          AND (CASE WHEN $na = 0.0 OR $nb = 0.0 THEN 0.0
                    ELSE $d / ($na * $nb) END) >= 0.35"""
      }),

    // ===== Multimodal: frame sampling over binary payloads =====
    QueryDef("q36_frame_sample",
      (s, dir) => {
        val media = T.documents(s, dir)
          .select(col("doc_id"), col("text").cast("binary").as("content"))
        graft.operators.Multimodal.sampleFrames(media, "doc_id", "content",
            frameSize = 64, everyN = 2)
          .select(col("media_id").as("doc_id"),
            col("frame_idx").cast("long").as("frame_idx"),
            Dedup.polyHash(col("frame").cast("string")).as("frame_hash"),
            length(col("frame")).cast("long").as("frame_len"))
      },
      Some("""
        WITH f AS (SELECT doc_id,
            unnest(list_filter(range(0, CAST(ceil(CAST(length(text) AS DOUBLE) / 64) AS INTEGER)),
                   i -> i % 2 = 0)) AS frame_idx,
            text FROM documents)
        SELECT doc_id, frame_idx,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range(1, length(substr(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64)) + 1),
              i -> CAST(ascii(substr(substr(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64), CAST(i AS INTEGER), 1)) AS BIGINT))),
            (a, b) -> (a * 31 + b) % 1000000007) AS frame_hash,
          length(substr(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64)) AS frame_len
        FROM f""")),

    // ===== Multimodal: stubbed decode → features → ANN composition =====
    // The stub featurizer is a folded byte histogram (L1-normalized in
    // float32) — arithmetic DuckDB reproduces exactly (REAL division is
    // IEEE binary32 in both engines), so this IS oracle-checkable.
    QueryDef("q37_media_ann",
      (s, dir) => {
        val media = T.documents(s, dir)
          .select(col("doc_id"), col("text").cast("binary").as("content"))
        val feats = graft.operators.Multimodal.featurize(media, "doc_id",
          "content", dim = 32)
        Similarity.bruteForceTopK(feats, feats.filter(col("media_id") < 4),
          "media_id", "features", k = 3)
          .withColumn("rank", col("rank").cast("long"))
      },
      Some {
        val d = duckDot("qv", "cv")
        val na = s"sqrt(${duckDot("qv", "qv")})"
        val nb = s"sqrt(${duckDot("cv", "cv")})"
        s"""
        WITH bk AS (SELECT doc_id, length(text) AS n,
            list_transform(range(1, length(text) + 1),
              i -> ascii(substr(text, CAST(i AS INTEGER), 1)) % 32) AS bs
          FROM documents),
        feats AS (SELECT doc_id,
            list_transform(range(0, 32), k ->
              CAST(len(list_filter(bs, b -> b = k)) AS REAL)
                / CAST(CASE WHEN n < 1 THEN 1 ELSE n END AS REAL)) AS fv
          FROM bk),
        q AS (SELECT doc_id AS query_id, fv AS qv FROM feats WHERE doc_id < 4),
        c AS (SELECT doc_id AS nbr_id, fv AS cv FROM feats),
        scored AS (SELECT query_id, nbr_id,
            CASE WHEN $na = 0.0 OR $nb = 0.0 THEN 0.0
                 ELSE $d / ($na * $nb) END AS sim
          FROM c CROSS JOIN q WHERE nbr_id != query_id)
        SELECT query_id, nbr_id, sim, "rank" FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, nbr_id) AS "rank" FROM scored)
        WHERE "rank" <= 3"""
      }),

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

    // ===== J4: lookup/classification =====
    QueryDef("q26_lookup_classify",
      (s, dir) => T.part(s, dir).select(col("p_partkey"), col("p_name"),
        Lookup.classify(col("p_name"), Seq(
          "warm" -> Seq("red", "orange"),
          "cool" -> Seq("blue", "green"),
          "neutral" -> Seq("white", "black", "gray")),
          caseSensitive = true, fallback = "other").as("category")),
      Some("""
        SELECT p_partkey, p_name,
          CASE WHEN p_name LIKE '%red%' OR p_name LIKE '%orange%' THEN 'warm'
               WHEN p_name LIKE '%blue%' OR p_name LIKE '%green%' THEN 'cool'
               WHEN p_name LIKE '%white%' OR p_name LIKE '%black%'
                 OR p_name LIKE '%gray%' THEN 'neutral'
               ELSE 'other' END AS category
        FROM part""")),

    // ===== F2: regex capture-group template substitution =====
    QueryDef("q27_regex_template",
      (s, dir) => T.customer(s, dir).select(col("c_custkey"), col("c_name"),
        CheckDsl.regexTemplate(col("c_name"), "^Customer#(\\d+)$",
          "cust-$1", Some("unknown")).as("tag")),
      Some("""
        SELECT c_custkey, c_name,
          CASE WHEN regexp_matches(c_name, '^Customer#(\d+)$')
               THEN 'cust-' || regexp_extract(c_name, '^Customer#(\d+)$', 1)
               ELSE 'unknown' END AS tag
        FROM customer""")),

    // ===== F7: date helpers =====
    QueryDef("q28_date_helpers",
      (s, dir) => T.orders(s, dir)
        .select(to_date(col("o_orderdate")).as("order_date")).distinct()
        .select(col("order_date"),
          DateFunctions.prevMonthStart(col("order_date")).as("prev_month_start"),
          DateFunctions.prevMonthEnd(col("order_date")).as("prev_month_end"),
          DateFunctions.prevWeekSameDay(col("order_date")).as("prev_week"),
          DateFunctions.prevYearSameDay(col("order_date")).as("prev_year"),
          DateFunctions.weekdayName(col("order_date")).as("weekday")),
      Some("""
        SELECT order_date,
               CAST(date_trunc('month', order_date - INTERVAL 1 MONTH) AS DATE) AS prev_month_start,
               last_day(order_date - INTERVAL 1 MONTH) AS prev_month_end,
               order_date - 7 AS prev_week,
               CAST(order_date - INTERVAL 1 YEAR AS DATE) AS prev_year,
               dayname(order_date) AS weekday
        FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS order_date FROM orders)""")),

    // ===== F4: header-map key normalization =====
    QueryDef("q29_header_normalize",
      (s, dir) => T.documents(s, dir).select(col("doc_id"),
          explode(HtmlFunctions.normalizeHeaderKeys(map(
            lit("Content-Type"), concat(lit("text/"), col("source")),
            lit("X-Cache-TTL"), col("n_chars").cast("string")))))
        .withColumnRenamed("key", "hkey").withColumnRenamed("value", "hval"),
      Some("""
        SELECT doc_id, 'content-type' AS hkey, 'text/' || source AS hval
        FROM documents
        UNION ALL
        SELECT doc_id, 'x-cache-ttl', CAST(n_chars AS VARCHAR) FROM documents""")),

    // ===== F5/A3: strip_html + wordcount =====
    QueryDef("q30_strip_html",
      (s, dir) => {
        val html = concat(lit("<body><script>var x = 1;</script><style>p{}</style><p>"),
          substring(col("text"), 1, 120), lit("</p><h1>hi</h1></body>"))
        T.documents(s, dir).select(col("doc_id"),
          TextFunctions.stripHtml(html).as("stripped"))
          .withColumn("n_words", TextFunctions.wordCount(col("stripped")).cast("long"))
      },
      Some("""
        WITH h AS (SELECT doc_id,
          '<body><script>var x = 1;</script><style>p{}</style><p>'
            || substr(text, 1, 120) || '</p><h1>hi</h1></body>' AS html
          FROM documents),
        st AS (SELECT doc_id,
          trim(regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(
                    regexp_replace(html, '(?is)<script\b.*?</script>', ' ', 'g'),
                    '(?is)<style\b.*?</style>', ' ', 'g'),
                  '(?is)<svg\b.*?</svg>', ' ', 'g'),
                '(?is)<noscript\b.*?</noscript>', ' ', 'g'),
              '(?s)<[^>]*>', ' ', 'g'),
            '\s+', ' ', 'g')) AS stripped
          FROM h)
        SELECT doc_id, stripped,
          len(list_filter(string_split_regex(stripped, '\s+'),
              w -> len(w) > 1 AND regexp_matches(w, '[a-zA-Z]'))) AS n_words
        FROM st""")),

    // ===== I1: watermark / unprocessed-marker incremental read =====
    QueryDef("q31_watermark_read",
      (s, dir) => {
        val ev = T.events(s, dir)
        val half = ev.agg(expr("max(event_id) div 2").as("__half"))
        val wm = ev.join(half).filter(col("event_id") <= col("__half"))
          .agg(max(col("ts")).as("__wm"))
        ev.join(wm).filter(col("ts") > col("__wm"))
          .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
            col("event_type"))
      },
      Some("""
        SELECT event_id, epoch_us(ts) AS ts_us, event_type
        FROM events
        WHERE ts > (SELECT max(ts) FROM events
                    WHERE event_id <= (SELECT max(event_id) // 2 FROM events))""")),

    // ===== S9: nested columnMapping rename through query results =====
    QueryDef("q33_column_mapping",
      (s, dir) => {
        T.registerAll(s, dir)
        val df = s.sql(
          """SELECT o_orderkey,
               struct(o_orderstatus AS st, o_totalprice AS tp) AS rec
             FROM orders""")
        graft.operators.QueryHelper.renameColumns(df, Map(
          "o_orderkey" -> "order_id", "rec.st" -> "status", "rec.tp" -> "total"))
          .select(col("order_id"), col("rec.status").as("status"),
            col("rec.total").as("total"))
      },
      Some("""
        SELECT o_orderkey AS order_id, o_orderstatus AS status,
               o_totalprice AS total
        FROM orders""")),

    // ===== A4: multi-join analytics, broadcast dimensions (TPC-H Q3) =====
    QueryDef("q40_shipping_priority",
      (s, dir) => {
        val c = T.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        val o = T.orders(s, dir).filter(col("o_orderdate") < lit("1998-06-30"))
        val l = T.lineitem(s, dir).filter(col("l_shipdate") > lit("1998-06-30"))
        // customer is the dimension side: broadcast it; orders↔lineitem
        // co-shuffle on orderkey
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"),
            to_date(col("o_orderdate")).as("order_date"),
            col("o_orderpriority"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"))
      },
      Some("""
        SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
               o_orderpriority,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
        GROUP BY 1, 2, 3""")),

    // ===== A4: six-way star join with tiny broadcast dims (TPC-H Q5) =====
    QueryDef("q41_region_volume",
      (s, dir) => {
        val r = T.region(s, dir).filter(col("r_name") === "EUROPE")
        val n = T.nation(s, dir)
        val c = T.customer(s, dir)
        val o = T.orders(s, dir)
        val l = T.lineitem(s, dir)
        val sup = T.supplier(s, dir)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(c, col("o_custkey") === col("c_custkey") &&
            col("s_nationkey") === col("c_nationkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"))
      },
      Some("""
        SELECT n_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
        GROUP BY n_name""")),

    // ===== Similarity: hyperplane-LSH ANN, portable integer-lattice
    // planes so the oracle reproduces the signatures bit-for-bit =====
    QueryDef("q42_lsh_topk",
      (s, dir) => {
        val e = T.embeddings(s, dir)
        Similarity.lshTopK(e, e.filter(col("vec_id") < 8),
          "vec_id", "embedding", k = 5, dim = 64, tables = 4,
          bitsPerTable = 8, planes = Some(q42Planes))
          .withColumn("rank", col("rank").cast("long"))
      },
      Some {
        def planeList(p: Seq[Double]): String =
          p.map(v => s"${v.toLong}.0").mkString("([", ", ", "]::DOUBLE[])")
        def sigExpr(tbl: Seq[Seq[Double]]): String =
          tbl.zipWithIndex.map { case (p, i) =>
            val d = duckDot("embedding", planeList(p))
            s"(CASE WHEN $d >= 0.0 THEN ${1L << i} ELSE 0 END)"
          }.mkString("(", "\n             + ", ")")
        val sigCols = q42Planes.zipWithIndex.map { case (tbl, t) =>
          s"${sigExpr(tbl)} AS sig$t" }.mkString(",\n            ")
        val arms = (0 until 4).map(t =>
          s"SELECT vec_id, $t AS tbl, sig$t AS sig FROM sigs")
          .mkString("\n          UNION ALL ")
        val d = duckDot("qv", "cv")
        val na = s"sqrt(${duckDot("qv", "qv")})"
        val nb = s"sqrt(${duckDot("cv", "cv")})"
        s"""
        WITH sigs AS (SELECT vec_id,
            $sigCols
          FROM embeddings),
        b AS ($arms),
        cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS nbr_id
                 FROM b c JOIN b q USING (tbl, sig)
                 WHERE q.vec_id < 8 AND c.vec_id != q.vec_id),
        scored AS (SELECT query_id, nbr_id,
            CASE WHEN $na = 0.0 OR $nb = 0.0 THEN 0.0
                 ELSE $d / ($na * $nb) END AS sim
          FROM cand
          JOIN (SELECT vec_id AS qid, embedding AS qv FROM embeddings)
            ON qid = query_id
          JOIN (SELECT vec_id AS nid, embedding AS cv FROM embeddings)
            ON nid = nbr_id)
        SELECT query_id, nbr_id, sim, "rank" FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, nbr_id) AS "rank" FROM scored)
        WHERE "rank" <= 5"""
      }),

    // ===== A4: rollup / grouping sets via the native surface =====
    QueryDef("q45_rollup",
      (s, dir) => T.orders(s, dir)
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue")),
      Some("""
        SELECT o_orderpriority, o_orderstatus, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""")),

    // ===== J-family: left-semi join (EXISTS) =====
    QueryDef("q46_semi_join",
      (s, dir) => T.orders(s, dir)
        .join(T.lineitem(s, dir).filter(col("l_quantity") >= 49),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice")),
      Some("""
        SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity >= 49)""")),

    // ===== set ops: EXCEPT (customers with no urgent orders) =====
    QueryDef("q47_except",
      (s, dir) => T.customer(s, dir).select(col("c_custkey"))
        .except(T.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("c_custkey"))),
      Some("""
        SELECT c_custkey FROM customer
        EXCEPT SELECT o_custkey AS c_custkey FROM orders
               WHERE o_orderpriority = '1-URGENT'""")),

    // ===== window frames: 7-day moving revenue (decimal-exact) =====
    QueryDef("q50_moving_avg",
      (s, dir) => {
        val daily = T.orders(s, dir)
          .groupBy(to_date(col("o_orderdate")).as("order_date"),
            col("o_orderpriority"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"),
            count(lit(1)).as("n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderpriority").orderBy("order_date")
          .rowsBetween(-6, 0)
        daily.select(col("o_orderpriority"), col("order_date"),
          sum(col("rev")).over(w).cast("double").as("rev_7d"),
          sum(col("n")).over(w).as("n_7d"))
      },
      Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS order_date, o_orderpriority,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
                 count(*) AS n
          FROM orders GROUP BY 1, 2)
        SELECT o_orderpriority, order_date,
               CAST(sum(rev) OVER (PARTITION BY o_orderpriority
                 ORDER BY order_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rev_7d,
               CAST(sum(n) OVER (PARTITION BY o_orderpriority
                 ORDER BY order_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d
        FROM daily""")),

    // ===== window frames: running cumulative counts =====
    QueryDef("q51_cumulative",
      (s, dir) => {
        val daily = T.orders(s, dir)
          .groupBy(to_date(col("o_orderdate")).as("order_date"))
          .agg(count(lit(1)).as("n"))
        // two-phase prefix sum bucketed by year-month: parallel local
        // windows + broadcast offsets; a global Window.orderBy would pull
        // every row through one task (long sums are associative, so this
        // is bit-equal to the single-partition form the oracle computes)
        Relational.prefixSum(daily,
            year(col("order_date")) * 100 + month(col("order_date")),
            Seq(col("order_date")), col("n"), "cumulative_orders")
          .select(col("order_date"), col("n"), col("cumulative_orders"))
      },
      Some("""
        SELECT order_date, n,
               CAST(sum(n) OVER (ORDER BY order_date
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_orders
        FROM (SELECT CAST(o_orderdate AS DATE) AS order_date, count(*) AS n
              FROM orders GROUP BY 1)""")),

    // ===== pivot via conditional aggregation =====
    QueryDef("q52_pivot_status",
      (s, dir) => T.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
          sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p")),
      Some("""
        SELECT o_orderpriority,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
               CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        FROM orders GROUP BY o_orderpriority""")),

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

    // ===== A4: range-filter aggregation (TPC-H Q6 shape) =====
    QueryDef("q56_revenue_forecast",
      (s, dir) => T.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1994-01-01") &&
          col("l_shipdate") < lit("1995-01-01") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          col("l_discount").cast("decimal(18,2)")).cast("double")
          .as("revenue")),
      Some("""
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= '1994-01-01' AND l_shipdate < '1995-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""")),

    // ===== A4/J4: conditional ratio over a join (TPC-H Q14 shape) =====
    QueryDef("q57_promo_revenue",
      (s, dir) => {
        val rev = (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        T.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit("1995-09-01") &&
            col("l_shipdate") < lit("1995-10-01"))
          .join(T.part(s, dir), col("l_partkey") === col("p_partkey"))
          .agg((lit(100.0) *
            sum(when(col("p_type").startsWith("PROMO"), rev)
              .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
            sum(rev).cast("double")).as("promo_revenue"))
      },
      Some("""
        SELECT 100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= '1995-09-01' AND l_shipdate < '1995-10-01'""")),

    // ===== A4/W1: group-having + join back (TPC-H Q18 shape) =====
    QueryDef("q58_big_orders",
      (s, dir) => {
        val big = T.lineitem(s, dir).groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("sum_qty"))
          .filter(col("sum_qty") > 250)
        T.orders(s, dir)
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            col("sum_qty"))
      },
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice, sum_qty
        FROM orders JOIN (
          SELECT l_orderkey, sum(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
        ) ON o_orderkey = l_orderkey""")),

    // ===== Multimodal: stubbed metadata decode (mapPartitions batch;
    // the stub's arithmetic is exactly expressible in SQL, so the
    // distributed plumbing gets a value-level oracle) =====
    QueryDef("q59_media_meta",
      (s, dir) => {
        val media = T.documents(s, dir).select(col("doc_id"),
          col("text").cast("binary").as("content"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"))
        graft.operators.Multimodal.withDecodedMeta(media, "doc_id",
            "content", "kind")
          .select(col("media_id"), col("kind"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("duration_ms"),
            col("sample_rate").cast("long").as("sample_rate"))
      },
      Some("""
        SELECT doc_id AS media_id,
               ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
               CAST(CASE doc_id % 3 WHEN 0 THEN (n % 640) + 1
                                    WHEN 1 THEN 0
                                    ELSE (n % 1920) + 1 END AS BIGINT) AS width,
               CAST(CASE doc_id % 3 WHEN 0 THEN (n % 480) + 1
                                    WHEN 1 THEN 0
                                    ELSE (n % 1080) + 1 END AS BIGINT) AS height,
               CAST(CASE doc_id % 3 WHEN 0 THEN 0
                                    WHEN 1 THEN n * 8
                                    ELSE n * 4 END AS BIGINT) AS duration_ms,
               CAST(CASE doc_id % 3 WHEN 1 THEN 16000 ELSE 0 END AS BIGINT)
                 AS sample_rate
        FROM (SELECT doc_id, length(text) AS n FROM documents)""")),

    // ===== Multimodal: stub resize (every-4th-byte downsample) =====
    QueryDef("q60_media_resize",
      (s, dir) => {
        val media = T.documents(s, dir).select(col("doc_id"),
          col("text").cast("binary").as("content"))
        graft.operators.Multimodal.resized(media, "doc_id", "content", 4)
          .select(col("media_id"),
            col("content").cast("string").as("resized"),
            length(col("content")).cast("long").as("n_bytes"))
      },
      Some("""
        SELECT doc_id AS media_id,
               array_to_string(list_transform(range(1, length(text) + 1, 4),
                 i -> substr(text, CAST(i AS INTEGER), 1)), '') AS resized,
               CAST(ceil(CAST(length(text) AS DOUBLE) / 4) AS BIGINT) AS n_bytes
        FROM documents""")),

    // ===== skew mitigation: two-phase salted aggregation. The salt is
    // deterministic and the per-(key, salt) partials merge to exactly the
    // plain group-sum (quantities are integer-valued doubles, so the
    // float sums are exact in any order — the oracle needs no salt) =====
    QueryDef("q55_salted_sum",
      (s, dir) => graft.operators.Skew.saltedSum(
        T.lineitem(s, dir)
          .select("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity"),
        Seq("l_returnflag"), "l_quantity", salts = 16),
      Some("""
        SELECT l_returnflag, sum(l_quantity) AS sum_l_quantity,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_returnflag""")),

    // ===== training pipeline: reproducible dataset split =====
    QueryDef("q48_dataset_split",
      (s, dir) => graft.operators.Sampling.deterministicSplit(
          T.documents(s, dir).select("doc_id", "lang"), "doc_id",
          Seq("train" -> 80, "val" -> 10, "test" -> 10), salt = "v1")
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n")),
      Some("""
        WITH b AS (SELECT doc_id, lang,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(1, length(doc_id::VARCHAR || 'v1') + 1),
                i -> CAST(ascii(substr(doc_id::VARCHAR || 'v1', CAST(i AS INTEGER), 1)) AS BIGINT))),
              (a, x) -> (a * 31 + x) % 1000000007) % 100 AS bucket
          FROM documents)
        SELECT lang,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n
        FROM b GROUP BY 1, 2""")),

    // ===== training pipeline: deterministic stratified sample =====
    QueryDef("q49_stratified_sample",
      (s, dir) => graft.operators.Sampling.stratifiedTopK(
          T.documents(s, dir).select("doc_id", "lang"), Seq("lang"),
          "doc_id", k = 5, salt = "v1")
        .select("lang", "doc_id"),
      Some("""
        WITH h AS (SELECT doc_id, lang,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(range(1, length(doc_id::VARCHAR || 'v1') + 1),
                i -> CAST(ascii(substr(doc_id::VARCHAR || 'v1', CAST(i AS INTEGER), 1)) AS BIGINT))),
              (a, x) -> (a * 31 + x) % 1000000007) % 1000000007 AS hv
          FROM documents)
        SELECT lang, doc_id FROM (
          SELECT lang, doc_id,
                 row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rn
          FROM h)
        WHERE rn <= 5""")),

    // ===== W1/streaming-adjacent: gap-based sessionization =====
    QueryDef("q43_sessionize",
      (s, dir) => Relational.sessionize(T.events(s, dir), Seq("user_id"),
          "ts", gapSeconds = 1800, tieBreak = Seq("event_id"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), col("session_id")),
      Some("""
        SELECT event_id, user_id, epoch_us(ts) AS ts_us,
               CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                        THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM (SELECT event_id, user_id, ts, epoch_us(ts) AS us,
                lag(epoch_us(ts)) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS prev_us
              FROM events)""")),

    // ===== session-level rollup on top of sessionization =====
    QueryDef("q44_session_stats",
      (s, dir) => Relational.sessionize(T.events(s, dir), Seq("user_id"),
          "ts", gapSeconds = 1800, tieBreak = Seq("event_id"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(unix_micros(col("ts"))).as("start_us"),
          max(unix_micros(col("ts"))).as("end_us"),
          (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
            .as("duration_us")),
      Some("""
        WITH sess AS (
          SELECT user_id, epoch_us(ts) AS us,
                 CAST(sum(CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
                          THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          FROM (SELECT event_id, user_id, ts,
                  lag(epoch_us(ts)) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS prev_us
                FROM events))
        SELECT user_id, session_id, count(*) AS n_events,
               min(us) AS start_us, max(us) AS end_us,
               max(us) - min(us) AS duration_us
        FROM sess GROUP BY user_id, session_id""")),

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
        WHERE NOT (value >= 50) OR event_type = 'error'"""))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  val oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(o => d.name -> o.trim)).toMap
}
