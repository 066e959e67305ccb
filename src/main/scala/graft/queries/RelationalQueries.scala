package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Tables => T, Url}
import graft.functions.{CheckDsl, DateFunctions, HtmlFunctions, TextFunctions}
import graft.operators.{Checks, Dedup, Lookup, Relational, Similarity}
import graft.operators.Checks.Spec
import Catalog.QueryDef

/** Relational tier of the query inventory: joins, windows,
  * aggregation surface, incremental reads, sampling, sessionization.
  * Oracle-parity rules live in [[Catalog]]'s scaladoc. */
private[queries] object RelationalQueries {
  import Catalog._

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
  )
}

