package graft.plans

import java.nio.file.Files
import java.time.LocalDate
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.ConfigLoader
import graft.sources._

/** Runner dispatch of the API-backed modules from YAML config. */
class RunnerApiSpec extends SparkSpec {

  private val yaml =
    """urlsets:
      |  dummy:
      |    - url: 'https://ex.com/'
      |aggregations:
      |  google_search_console:
      |    cron: '0 0 * * *'
      |    settings:
      |      properties:
      |        - property: 'https://ex.com/'
      |          tablename: 'gsc'
      |          dateDaysAgo: 3
      |          dimensions: ['page']
      |          searchTypes: ['web']
      |          previousData: ['day']
      |  google_analytics:
      |    cron: '0 1 * * *'
      |    settings:
      |      views_config:
      |        - view: '123'
      |          tablename: 'ga'
      |          metrics: ['sessions']
      |          dimensions: ['pagePath']
      |  sistrix_domain:
      |    cron: '0 2 * * *'
      |    settings:
      |      domain: 'ex.com'
      |      tablename: 'sistrix'
      |      methods:
      |        - method: 'domain.sichtbarkeitsindex'
      |          fieldName: 'visibilityindex'
      |""".stripMargin

  test("runner dispatches GSC/GA/Sistrix modules with injected APIs") {
    val root = Files.createTempDirectory("graft_runner_api").toString
    val gsc = new SearchAnalyticsApi {
      override def query(property: String, searchType: String,
                         start: LocalDate, end: LocalDate,
                         dimensions: Seq[String], startRow: Int,
                         rowLimit: Int): Seq[GscRow] =
        (0 until 2).map(i => GscRow(dimensions.map(d => s"$d-$i"),
          start.getDayOfMonth + i, 10.0, 0.1, 2.0)).drop(startRow)
    }
    val ga = new GaReportingApi {
      override def batchGet(view: String, date: LocalDate, metrics: Seq[String],
                            dimensions: Seq[String], pageToken: Option[String],
                            pageSize: Int): GaPage =
        GaPage(dimensions.map("ga:" + _) ++ metrics.map("ga:" + _),
          Seq(Seq("/a", "5")), None)
    }
    val sistrix = new SistrixApi {
      override def call(method: String, params: Map[String, String]): Option[Double] =
        Some(42.0)
    }
    val runner = new Runner(spark, ConfigLoader.load(yaml), root,
      new FailingFetcher(), gscApi = Some(gsc), gaApi = Some(ga),
      sistrixApi = Some(sistrix),
      today = () => LocalDate.of(2024, 3, 18))
    runner.runAllOnce()

    val gscOut = runner.warehouse.read("gsc")
    assert(gscOut.count() === 2)
    assert(gscOut.columns.contains("clicksPreviousDay"))
    assert(gscOut.select("date").head().getDate(0)
      === java.sql.Date.valueOf("2024-03-15"), "dateDaysAgo=3 honored")
    assert(runner.warehouse.read("ga").select("sessions").head().getLong(0) === 5L)
    assert(runner.warehouse.read("sistrix").select("visibilityindex")
      .head().getDouble(0) === 42.0)

    // missing api → clear error
    val bare = new Runner(spark, ConfigLoader.load(yaml), root, new FailingFetcher())
    intercept[IllegalArgumentException] {
      bare.runAggregation("google_search_console")
    }
  }

  test("google_search_console matching operation enriches the imported table") {
    val root = Files.createTempDirectory("graft_gsc_match").toString
    val matchYaml =
      """urlsets:
        |  dummy:
        |    - url: 'https://ex.com/'
        |operations:
        |  google_search_console:
        |    cron: '0 4 * * *'
        |    settings:
        |      inputTable: 'gsc'
        |      tablename: 'gsc_matched'
        |      excludeInputFields: ['clicks']
        |      matches:
        |        - inputField: 'page'
        |          outputField: 'section'
        |          fallback: 'other'
        |          expressions:
        |            - regex: 'https://[^/]+/([a-z]+)/'
        |              output: 'sec-$1'
        |""".stripMargin
    val runner = new Runner(spark, ConfigLoader.load(matchYaml), root,
      new FailingFetcher())
    // seed the warehouse gsc table
    import spark.implicits._
    runner.warehouse.append("gsc", Seq(
      ("2024-03-15", "https://ex.com/blog/a.html", 3.0),
      ("2024-03-15", "https://ex.com/shop/b.html", 5.0),
      ("2024-03-15", "https://ex.com/c.html", 7.0))
      .toDF("date", "page", "clicks"))
    runner.runOperation("google_search_console")
    val out = runner.warehouse.read("gsc_matched")
    assert(!out.columns.contains("clicks"), "excluded input field dropped")
    val m = out.select("page", "section").as[(String, String)].collect().toMap
    assert(m("https://ex.com/blog/a.html") === "sec-blog")
    assert(m("https://ex.com/shop/b.html") === "sec-shop")
    assert(m("https://ex.com/c.html") === "other")
  }
}
