package graft.core

import java.security.MessageDigest
import scala.jdk.CollectionConverters._
import org.yaml.snakeyaml.Yaml

/** Typed project configuration — the Spark rebuild of the reference's
  * YAML config layer (/root/reference/utilities/configuration.py:126-199,
  * loader /root/reference/utilities/configuration_loader.py:92-141):
  * databases, urlsets, aggregations, operations, cron per module, settings
  * dicts, sha256 content hash. Scheduling itself stays external (SURVEY
  * §0) — the cron strings are carried as data for the orchestrator.
  */
final case class UrlsetUrl(url: String, render: Boolean = false)

final case class ModuleConfig(
    module: String,
    cron: String,
    database: String,            // staging target: "staging" | "warehouse"
    urlsets: Seq[String],
    settings: Map[String, Any],
    checks: Map[String, Any],
    /** operations: per-urlset check config (urlsets entries of the shape
      * {url: <set>, checks: {...}}, config.example.yaml:242-299). */
    urlsetChecks: Map[String, Map[String, Any]] = Map.empty)

final case class ProjectConfig(
    hash: String,
    databases: Map[String, Map[String, String]],
    urlsets: Map[String, Seq[UrlsetUrl]],
    aggregations: Seq[ModuleConfig],
    operations: Seq[ModuleConfig]) {

  def urlsetUrls(name: String): Seq[UrlsetUrl] =
    urlsets.getOrElse(name,
      throw new IllegalArgumentException(s"unknown urlset '$name'"))

  def aggregation(module: String): ModuleConfig =
    aggregations.find(_.module == module).getOrElse(
      throw new IllegalArgumentException(s"unknown aggregation '$module'"))

  def operation(module: String): ModuleConfig =
    operations.find(_.module == module).getOrElse(
      throw new IllegalArgumentException(s"unknown operation '$module'"))
}

object ConfigLoader {

  final case class ConfigError(message: String) extends RuntimeException(message)

  /** Parse + validate one YAML document (configuration_loader.py:124-141
    * error mapping: missing/invalid keys become typed errors). */
  def load(yamlText: String): ProjectConfig = {
    val root = asMap(new Yaml().load[Any](yamlText), "document root")
    val hash = sha256(yamlText)

    val databases = root.get("databases").map(asMap(_, "databases").map {
      case (k, v) => k -> asMap(v, s"databases.$k").map { case (kk, vv) =>
        kk -> String.valueOf(vv)
      }
    }).getOrElse(Map.empty)

    val urlsets = root.get("urlsets").map(asMap(_, "urlsets").map {
      case (name, v) =>
        val urls = asList(v, s"urlsets.$name").map { entry =>
          val m = asMap(entry, s"urlsets.$name[]")
          val url = m.getOrElse("url",
            throw ConfigError(s"urlsets.$name entry missing 'url'")).toString
          if (!Validation.validUrl(url))
            throw ConfigError(s"urlsets.$name has invalid url '$url'")
          val render = m.get("render").exists(b => b == true || b == "true")
          UrlsetUrl(url, render)
        }
        if (urls.isEmpty) throw ConfigError(s"urlset '$name' is empty")
        name -> urls
    }).getOrElse(Map.empty)

    // module order matters (module-debugger runs in declaration order, and
    // e.g. alerting_check reads what bigquery_queries wrote) — preserve
    // the YAML's insertion order instead of going through a Scala Map
    def orderedEntries(v: Any, where: String): Seq[(String, Any)] = v match {
      case m: java.util.Map[_, _] =>
        m.asScala.toSeq.map { case (k, vv) => String.valueOf(k) -> (vv: Any) }
      case null => throw ConfigError(s"$where is empty")
      case other => throw ConfigError(s"$where must be a mapping, got ${other.getClass.getSimpleName}")
    }

    def modules(key: String, defaultDb: String): Seq[ModuleConfig] =
      root.get(key).map(orderedEntries(_, key).map { case (module, v) =>
        val m = asMap(v, s"$key.$module")
        val cron = m.getOrElse("cron",
          throw ConfigError(s"$key.$module missing 'cron'")).toString
        if (!validCron(cron)) throw ConfigError(s"$key.$module invalid cron '$cron'")
        // urlsets entries are plain names (aggregations) or
        // {url: <name>, checks: {...}} maps (operations)
        val rawSets = m.get("urlsets").map(asList(_, s"$key.$module.urlsets"))
          .getOrElse(Nil)
        val setNames = rawSets.map {
          case s: String => s
          case mm: java.util.Map[_, _] =>
            asMap(mm, s"$key.$module.urlsets[]").getOrElse("url",
              throw ConfigError(s"$key.$module urlset entry missing 'url'")).toString
          case other =>
            throw ConfigError(s"$key.$module urlset entry has bad type ${other.getClass}")
        }
        val perSetChecks = rawSets.collect {
          case mm: java.util.Map[_, _] =>
            val em = asMap(mm, s"$key.$module.urlsets[]")
            em.get("url").map(_.toString).getOrElse("") ->
              em.get("checks").map(asAnyMap).getOrElse(Map.empty[String, Any])
        }.filter(_._2.nonEmpty).toMap
        ModuleConfig(
          module = module,
          cron = cron,
          database = m.get("database").map(_.toString).getOrElse(defaultDb),
          urlsets = setNames,
          settings = m.get("settings").map(asAnyMap).getOrElse(Map.empty),
          checks = m.get("checks").map(asAnyMap).getOrElse(Map.empty),
          urlsetChecks = perSetChecks)
      }).getOrElse(Nil)

    // defaults mirror configuration_loader.py:372 (aggregation → staging
    // store, operation → checks store)
    val aggs = modules("aggregations", "staging")
    val ops = modules("operations", "checks")

    // referenced urlsets must exist
    (aggs ++ ops).foreach { mc =>
      mc.urlsets.foreach { u =>
        if (!urlsets.contains(u))
          throw ConfigError(s"module '${mc.module}' references unknown urlset '$u'")
      }
    }

    ProjectConfig(hash, databases, urlsets, aggs, ops)
  }

  def loadFile(path: String): ProjectConfig =
    load(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  /** 5-field cron shape check (scheduling is external; we only validate). */
  private[core] def validCron(cron: String): Boolean =
    cron.trim.split("\\s+").length == 5

  private def sha256(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def asMap(v: Any, where: String): Map[String, Any] = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) => String.valueOf(k) -> (vv: Any) }.toMap
    case null => throw ConfigError(s"$where is empty")
    case other => throw ConfigError(s"$where must be a mapping, got ${other.getClass.getSimpleName}")
  }

  private def asAnyMap(v: Any): Map[String, Any] = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) => String.valueOf(k) -> deepConvert(vv) }.toMap
    case _ => Map.empty
  }

  private def deepConvert(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) => String.valueOf(k) -> deepConvert(vv) }.toMap
    case l: java.util.List[_] => l.asScala.map(deepConvert).toSeq
    case other => other
  }

  private def asList(v: Any, where: String): Seq[Any] = v match {
    case l: java.util.List[_] => l.asScala.toSeq
    case null => throw ConfigError(s"$where is empty")
    case other => throw ConfigError(s"$where must be a list, got ${other.getClass.getSimpleName}")
  }
}
