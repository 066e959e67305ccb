package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{ModuleConfig, ProjectConfig}
import graft.sources._

/** Module registry + dispatch — the rebuild of the reference's runner
  * (/root/reference/modules/runner.py:11-25: importlib dispatch on
  * (tier, module)) and its module-debugger
  * (/root/reference/module-debugger.py:1-24: run every aggregation, then
  * every operation, once, synchronously).
  *
  * One Runner = one project config bound to one storage root. Scheduling
  * is external (the cron strings in the config are data for an
  * orchestrator); `runAggregation`/`runOperation` are the task bodies it
  * would invoke.
  */
final class Runner(spark: SparkSession, config: ProjectConfig, root: String,
                   fetcher: Fetcher,
                   now: () => java.sql.Timestamp =
                     () => new java.sql.Timestamp(System.currentTimeMillis())) {

  val staging = new StagingStore(spark, root)
  val warehouse = new Warehouse(spark, root)
  val queues = new QueueStore(spark, root)

  /** The checks fact table: one partitioned table with an urlset column
    * instead of the reference's table-per-urlset (SURVEY §1.1 verdict). */
  val ChecksTable = "checks"

  // ------------------------------------------------------------ dispatch

  def runAggregation(name: String): Unit = {
    val mc = config.aggregation(name)
    name match {
      case "html_parser" => runHtmlParser(mc)
      case "robotstxt" => runRobotstxt(mc)
      case other =>
        throw new IllegalArgumentException(s"unknown aggregation module '$other'")
    }
  }

  def runOperation(name: String): Unit = {
    val mc = config.operation(name)
    name match {
      case "metatags" => runMetatags(mc)
      case "responseheader" => runResponseheader(mc)
      case "htmlheadings" => runHtmlheadings(mc)
      case "robotstxt" => runRobotstxtChecks(mc)
      case other =>
        throw new IllegalArgumentException(s"unknown operation module '$other'")
    }
  }

  /** module-debugger semantics: everything once, aggregations first. */
  def runAllOnce(): Unit = {
    config.aggregations.foreach(mc => runAggregation(mc.module))
    config.operations.foreach(mc => runOperation(mc.module))
  }

  // -------------------------------------------------------- aggregations

  private def configUrls(mc: ModuleConfig): Seq[ConfigUrl] =
    mc.urlsets.flatMap(set =>
      config.urlsetUrls(set).map(u => ConfigUrl(set, u.url, u.render)))

  private def userAgent(mc: ModuleConfig): String =
    mc.settings.get("useragent").map(_.toString).filter(_.nonEmpty)
      .getOrElse(HtmlParserSource.DefaultUserAgent)

  private def runHtmlParser(mc: ModuleConfig): Unit =
    staging.append("html_parser",
      HtmlParserSource.stage(spark, configUrls(mc), fetcher, userAgent(mc),
        now = now))

  private def runRobotstxt(mc: ModuleConfig): Unit =
    staging.append("robotstxt",
      RobotstxtSource.stage(spark, configUrls(mc), fetcher, userAgent(mc),
        now = now))

  // ---------------------------------------------------------- operations

  /** Incremental read + check computation + append + watermark advance —
    * the staging pipeline of SURVEY §3.3, one lazily-planned DAG per op. */
  private def withStagedBatch(collection: String, op: String)
                             (f: (DataFrame, DataFrame) => Seq[DataFrame]): Unit = {
    if (!staging.exists(collection)) return
    val batch = staging.readUnprocessed(collection, op)
    if (batch.isEmpty) return
    val history = staging.watermark(collection, op) match {
      case Some(wm) => staging.readAll(collection)
        .filter(col("__ingested_at") <= lit(wm))
      case None => batch.limit(0)
    }
    val parts = f(batch, history)
    if (parts.nonEmpty) {
      val rows = parts.reduce(_.unionByName(_))
        .withColumn("date", to_date(col("created")))
      warehouse.append(ChecksTable, rows)
    }
    staging.advanceWatermark(collection, op, batch)
  }

  private def bool(m: Map[String, Any], key: String): Option[Boolean] =
    m.get(key).map(v => v == true || v == "true")

  private def runMetatags(mc: ModuleConfig): Unit =
    withStagedBatch("html_parser", "metatags") { (batch, history) =>
      mc.urlsetChecks.toSeq.sortBy(_._1).flatMap { case (set, checks) =>
        val staged = batch.filter(col("urlset") === set)
        val hist = history.filter(col("urlset") === set)
        val title = checks.get("title").collect { case m: Map[String @unchecked, Any @unchecked] => m }.getOrElse(Map.empty)
        val desc = checks.get("description").collect { case m: Map[String @unchecked, Any @unchecked] => m }.getOrElse(Map.empty)
        val canon = checks.get("canonical").collect { case m: Map[String @unchecked, Any @unchecked] => m }.getOrElse(Map.empty)
        Seq(
          bool(title, "has_title").map(a => CheckCatalog.hasTitle(staged, a)),
          bool(title, "has_title").map(_ => CheckCatalog.hasMultipleTitles(staged)),
          bool(title, "is_title_empty").map(a => CheckCatalog.isTitleEmpty(staged, a)),
          bool(title, "has_title_changed").map(a => CheckCatalog.hasTitleChanged(staged, hist, a)),
          bool(title, "has_title_duplicates").map(a => CheckCatalog.hasTitleDuplicates(staged, a)),
          bool(desc, "has_description").map(a => CheckCatalog.hasDescription(staged, a)),
          bool(desc, "has_description").map(_ => CheckCatalog.hasMultipleDescriptions(staged)),
          bool(desc, "is_description_empty").map(a => CheckCatalog.isDescriptionEmpty(staged, a)),
          bool(desc, "has_description_changed").map(a => CheckCatalog.hasDescriptionChanged(staged, hist, a)),
          bool(desc, "has_description_duplicates").map(a => CheckCatalog.hasDescriptionDuplicates(staged, a)),
          bool(canon, "has_canonical").map(a => CheckCatalog.hasCanonical(staged, a)),
          bool(canon, "canonical_is_self_referencing")
            .filter(identity).map(_ => CheckCatalog.canonicalSelfReferencing(staged))
        ).flatten
      }
    }

  private def runResponseheader(mc: ModuleConfig): Unit =
    withStagedBatch("html_parser", "responseheader") { (batch, _) =>
      mc.urlsetChecks.toSeq.sortBy(_._1).map { case (set, checks) =>
        val asserts = checks.collect {
          case (k, m: Map[String @unchecked, Any @unchecked]) if m.contains("assert") =>
            k -> m("assert").toString
        }
        CheckCatalog.responseHeaders(batch.filter(col("urlset") === set), asserts)
      }
    }

  private def runHtmlheadings(mc: ModuleConfig): Unit =
    withStagedBatch("html_parser", "htmlheadings") { (batch, _) =>
      mc.urlsetChecks.toSeq.sortBy(_._1).flatMap { case (set, checks) =>
        checks.get("count_headline_h1").map(v =>
          CheckCatalog.countHeadlineH1(batch.filter(col("urlset") === set),
            v.toString.toInt))
      }
    }

  private def runRobotstxtChecks(mc: ModuleConfig): Unit =
    withStagedBatch("robotstxt", "robotstxt") { (batch, _) =>
      mc.urlsetChecks.toSeq.sortBy(_._1).flatMap { case (set, checks) =>
        val staged = batch.filter(col("urlset") === set)
        Seq(
          checks.get("status_code").map(v =>
            CheckCatalog.robotsStatusCode(staged, v.toString.toInt)),
          bool(checks, "has_sitemap_xml").map(a =>
            CheckCatalog.robotsHasSitemap(staged, a))
        ).flatten
      }
    }
}
