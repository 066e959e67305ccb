package graft.sources

import java.nio.file.Files
import java.time.LocalDate
import org.apache.spark.sql.functions._
import graft.SparkSpec

class ApiSourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft_api").toString

  /** Deterministic GSC fixture: rowsPerDay rows per (searchType, day);
    * previous-period metrics derive from the date so joins are checkable.
    * Paging is honored (slices by startRow). */
  final class FixtureGsc(rowsPerDay: Int, emptyDates: Set[LocalDate] = Set.empty)
    extends SearchAnalyticsApi {
    var calls = 0
    override def query(property: String, searchType: String, start: LocalDate,
                       end: LocalDate, dimensions: Seq[String], startRow: Int,
                       rowLimit: Int): Seq[GscRow] = {
      calls += 1
      if (emptyDates.contains(start)) return Seq.empty
      val all = (0 until rowsPerDay).map { i =>
        GscRow(dimensions.map(d => s"$d-$i"),
          clicks = start.getDayOfMonth * 100.0 + i,
          impressions = start.getDayOfMonth * 1000.0 + i,
          ctr = 0.1, position = 3.0)
      }
      all.slice(startRow, startRow + rowLimit)
    }
  }

  test("GSC: pivot, previous-day join, convention schema, idempotency") {
    val wh = new Warehouse(spark, tmp())
    val cfg = GscConfig("https://ex.com/", "gsc",
      requestDate = LocalDate.of(2024, 3, 15),
      dimensions = Seq("page", "device"), searchTypes = Seq("web"),
      previousData = Seq("day", "week"))
    val api = new FixtureGsc(4)
    assert(GscSource.importProperty(spark, api, cfg, wh) === Imported(4))
    val out = wh.read("gsc")
    assert(out.columns.toSet === Set("searchType", "page", "device", "clicks",
      "impressions", "ctr", "position", "property", "date",
      "clicksPreviousDay", "impressionsPreviousDay",
      "clicksPreviousWeek", "impressionsPreviousWeek"))
    val row = out.filter(col("page") === "page-0").head()
    assert(row.getAs[Double]("clicks") === 1500.0)          // day 15
    assert(row.getAs[Double]("clicksPreviousDay") === 1400.0) // day 14
    assert(row.getAs[Double]("clicksPreviousWeek") === 800.0) // day 8
    // replay → AlreadyExists, no extra rows
    assert(GscSource.importProperty(spark, api, cfg, wh) === AlreadyExists)
    assert(wh.read("gsc").count() === 4)
  }

  test("GSC: month range is snapped to first..last day") {
    val ranges = GscSource.previousRanges(LocalDate.of(2024, 3, 15),
      Seq("month", "year"))
    assert(ranges.contains(("PreviousMonth",
      LocalDate.of(2024, 2, 1), LocalDate.of(2024, 2, 29))))
    assert(ranges.contains(("PreviousYear",
      LocalDate.of(2023, 3, 15), LocalDate.of(2023, 3, 15))))
  }

  test("GSC: paging requests subsequent startRows") {
    val wh = new Warehouse(spark, tmp())
    val api = new FixtureGsc(GscSource.RowLimit + 7)
    val cfg = GscConfig("https://big.com/", "gsc_big",
      requestDate = LocalDate.of(2024, 3, 10),
      dimensions = Seq("page"), searchTypes = Seq("web"))
    assert(GscSource.importProperty(spark, api, cfg, wh)
      === Imported(GscSource.RowLimit + 7))
  }

  test("GSC run: empty data enqueues a retry with the original date") {
    val root = tmp()
    val wh = new Warehouse(spark, root)
    val q = new QueueStore(spark, root)
    val d = LocalDate.of(2024, 3, 15)
    val api = new FixtureGsc(3, emptyDates = Set(d))
    val cfg = GscConfig("https://late.com/", "gsc_late", requestDate = d,
      dimensions = Seq("page"), searchTypes = Seq("web"))
    val out = GscSource.run(spark, api, Seq(cfg), wh, q)
    assert(out("https://late.com/") === NotAvailableYet)
    // retry replays with original requestDate once data exists
    val api2 = new FixtureGsc(2)
    val out2 = GscSource.run(spark, api2, Seq.empty, wh, q)
    assert(out2("https://late.com/") === Imported(2))
    assert(wh.read("gsc_late").select("date").head().getDate(0)
      === java.sql.Date.valueOf(d))
  }

  final class FixtureGa(pages: Int, perPage: Int) extends GaReportingApi {
    override def batchGet(view: String, date: LocalDate, metrics: Seq[String],
                          dimensions: Seq[String], pageToken: Option[String],
                          pageSize: Int): GaPage = {
      val pageNo = pageToken.map(_.toInt).getOrElse(0)
      val headers = dimensions.map("ga:" + _) ++ metrics.map("ga:" + _)
      val rows = (0 until perPage).map { i =>
        dimensions.map(d => s"$d-v$pageNo-$i") ++
          metrics.map(_ => (pageNo * perPage + i).toString)
      }
      GaPage(headers, rows,
        if (pageNo + 1 < pages) Some((pageNo + 1).toString) else None)
    }
  }

  test("GA: prefix strip, paging, convention cast, idempotency") {
    val wh = new Warehouse(spark, tmp())
    val cfg = GaConfig("12345", "ga", LocalDate.of(2024, 4, 1),
      metrics = Seq("sessions", "bounceRate"), dimensions = Seq("pagePath"))
    assert(GaSource.importView(spark, new FixtureGa(3, 5), cfg, wh)
      === Imported(15))
    val out = wh.read("ga")
    assert(out.columns.toSet ===
      Set("pagePath", "sessions", "bounceRate", "view", "date"))
    import org.apache.spark.sql.types._
    assert(out.schema("sessions").dataType === LongType, "int-table metric")
    assert(out.schema("bounceRate").dataType === DoubleType, "float-table metric")
    assert(out.schema("pagePath").dataType === StringType)
    assert(GaSource.importView(spark, new FixtureGa(1, 1), cfg, wh)
      === AlreadyExists)
  }

  test("GA: duplicate column after strip is rejected") {
    val api = new GaReportingApi {
      override def batchGet(view: String, date: LocalDate, metrics: Seq[String],
                            dimensions: Seq[String], pageToken: Option[String],
                            pageSize: Int): GaPage =
        GaPage(Seq("ga:users", "users"), Seq(Seq("1", "2")), None)
    }
    val wh = new Warehouse(spark, tmp())
    intercept[GaSource.DuplicateColumn] {
      GaSource.importView(spark, api,
        GaConfig("v", "ga_dup", LocalDate.now(), Seq("users"), Nil), wh)
    }
  }

  test("GA metric typing follows reference regex anchoring") {
    import org.apache.spark.sql.types._
    assert(GaMetricTypes.sparkTypeFor("goal12Completions") === LongType)
    assert(GaMetricTypes.sparkTypeFor("goal3ConversionRate") === DoubleType)
    assert(GaMetricTypes.sparkTypeFor("date") === DateType)
    assert(GaMetricTypes.sparkTypeFor("view") === LongType)
    assert(GaMetricTypes.sparkTypeFor("pagePath") === StringType)
    assert(GaMetricTypes.sparkTypeFor("avgSessionDuration") === DoubleType)
  }

  test("Sistrix domain: wide row, weekday gate, dedup") {
    val wh = new Warehouse(spark, tmp())
    val api = new SistrixApi {
      override def call(method: String, params: Map[String, String]): Option[Double] =
        Some(method.length.toDouble)
    }
    val methods = Seq(
      SistrixMethod("domain.sichtbarkeitsindex", "visibilityindex"),
      SistrixMethod("domain.kwcount.seo", "kwcountSeo"))
    val d = LocalDate.of(2024, 5, 6) // a Monday
    assert(SistrixDomainSource.importDaily(spark, api, "domain" -> "ex.com",
      methods, "sistrix", wh, d, onlyOnWeekday = Some("Monday"), today = d)
      === Imported(1))
    val row = wh.read("sistrix").head()
    assert(row.getAs[Double]("visibilityindex") === 25.0)
    assert(row.getAs[Double]("kwcountSeo") === 18.0)
    // gate blocks on wrong weekday
    assert(SistrixDomainSource.importDaily(spark, api, "domain" -> "ex2.com",
      methods, "sistrix", wh, d, onlyOnWeekday = Some("Friday"), today = d)
      === Imported(0))
    // replay dedups
    assert(SistrixDomainSource.importDaily(spark, api, "domain" -> "ex.com",
      methods, "sistrix", wh, d, today = d) === AlreadyExists)
  }

  test("Sistrix optimizer positionOverflow parse") {
    assert(SistrixOptimizerSource.parsePosition("42") === ((Some(42), false)))
    assert(SistrixOptimizerSource.parsePosition(">100") === ((Some(100), true)))
    assert(SistrixOptimizerSource.parsePosition(null) === ((None, false)))
    intercept[SistrixOptimizerSource.InvalidPosition] {
      SistrixOptimizerSource.parsePosition("garbage")
    }
    val df = Seq("42", ">100").toDF("raw")
    val out = SistrixOptimizerSource.withParsedPosition(df, "raw")
      .select("position", "positionOverflow").as[(Int, Boolean)].collect().toSeq
    assert(out === Seq((42, false), (100, true)))
  }

  test("PageSpeed: labdata parse, log table, retry counter drains to zero") {
    val root = tmp()
    val wh = new Warehouse(spark, root)
    val q = new QueueStore(spark, root)
    val goodBody =
      """{"lighthouseResult":{"audits":{
        "first-contentful-paint":{"numericValue":900.1},
        "interactive":{"numericValue":2500.0}},
        "categories":{"performance":{"score":0.88}}}}"""
    val fetcher = new Fetcher {
      override def fetch(url: String, ua: String): FetchResult =
        if (url.contains("good")) FetchResult(url, 200,
          Map("content-type" -> "application/json"), goodBody)
        else FetchResult(url, 500, Map.empty, "boom")
    }
    def apiUrl(u: String, s: String) = s"api://$u&strategy=$s"
    val reqs = Seq(
      PageSpeedSource.Request("c1", "good.com", "mobile"),
      PageSpeedSource.Request("c1", "bad.com", "mobile"))
    PageSpeedSource.run(spark, reqs, fetcher, apiUrl, wh, q)
    val typed = wh.read("pagespeed")
    assert(typed.count() === 1)
    val lab = typed.select("labdata.firstContentfulPaint", "performanceScore")
      .as[(Double, Double)].head()
    assert(lab === ((900.1, 0.88)))
    assert(wh.read("pagespeed_log").count() === 2)
    // retry counter: 3 → 2 → 1 → dropped
    val schema = Seq(("", "", "", 0)).toDF("cluster", "url", "strategy", "retries").schema
    assert(q.peek("pagespeed_retry", schema).head().getInt(3) === 2)
    PageSpeedSource.run(spark, Seq.empty, fetcher, apiUrl, wh, q)
    assert(q.peek("pagespeed_retry", schema).head().getInt(3) === 1)
    PageSpeedSource.run(spark, Seq.empty, fetcher, apiUrl, wh, q)
    assert(q.peek("pagespeed_retry", schema).count() === 0,
      "exhausted retries drop out")
    // log accumulated one row per attempt: 2 + 1 + 1
    assert(wh.read("pagespeed_log").count() === 4)
  }

  test("GSC naming-convention typer: date/metric prefixes/Previous-nullable") {
    import org.apache.spark.sql.types._
    val sch = GscSchema.schemaFor(Seq(
      "date", "query", "clicks", "ctrPrevious", "positionDesktop", "page"))
    assert(sch("date").dataType === DateType)
    assert(sch("query").dataType === StringType)
    assert(sch("clicks").dataType === DoubleType)
    assert(sch("ctrPrevious").dataType === DoubleType)
    assert(sch("ctrPrevious").nullable, "Previous columns are nullable")
    assert(!sch("clicks").nullable)
    assert(sch("positionDesktop").dataType === DoubleType,
      "prefix match, like the reference's startswith")
    val typed = GscSchema.applyTo(
      Seq(("2024-05-01", "1.5", "kw")).toDF("date", "clicks", "query"))
    assert(typed.schema("date").dataType === DateType)
    assert(typed.schema("clicks").dataType === DoubleType)
    assert(typed.head().getDouble(1) === 1.5)
  }
}
