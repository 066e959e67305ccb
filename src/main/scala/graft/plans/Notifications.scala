package graft.plans

import graft.plans.Alerting.Notifier

/** Notification substance behind the [[Alerting.Notifier]] boundary:
  * email rendering with a plaintext log attachment, and Wrike task
  * creation in per-alert or summarized mode.
  *
  * Reference behavior:
  *  - template semantics: resources/templates/alerting_dispatcher/
  *    email_alert.txt:1-7 (title + infotext, one line per alert, capped
  *    at 10 with an ellipsis);
  *  - log attachment + dispatch flow: alerting_dispatcher.py:130-179;
  *  - SMTP encryption modes: service/email/dispatcher.py:17-36;
  *  - Wrike per-alert vs summarized: alerting_dispatcher.py:181-273.
  *
  * Transports (SMTP socket, Wrike HTTP) stay behind traits so the
  * pipeline is testable offline, same pattern as the Fetcher/Api
  * boundaries.
  */
object Notifications {

  /** One drained alert: (created, message, payload-json). */
  final case class Alert(created: java.sql.Timestamp, message: String,
                         payload: String)

  // ------------------------------------------------------------ rendering

  private def fmt(ts: java.sql.Timestamp, pattern: String): String = {
    val f = new java.text.SimpleDateFormat(pattern)
    f.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    f.format(ts)
  }

  /** A loaded template body plus its autoescape mode (decided by the
    * file extension, like the reference's select_autoescape). */
  final case class Template(source: String, autoescape: Boolean = true)

  /** The stock templates shipped in the jar — standalone equivalents of
    * the reference's email_alert.txt/.html (title + infotext, one line
    * per alert, capped at 10 with an ellipsis via the loop.index break).
    * Used when a config doesn't point at custom files of its own. */
  lazy val stockText: Template = Template(
    Templates.load("resources/templates", "alerting_dispatcher/email_alert.txt"))
  lazy val stockHtml: Template = Template(
    Templates.load("resources/templates", "alerting_dispatcher/email_alert.html"))

  /** Render the stock text template (reference semantics: title and
    * infotext paragraphs, then `<ts> - <message>` per alert, at most 10
    * lines then an ellipsis). */
  def renderText(title: String, infotext: String,
                 alerts: Seq[Alert]): String =
    Templates.render(stockText.source,
      Map("title" -> title, "infotext" -> infotext, "alerts" -> alerts),
      autoescape = stockText.autoescape)

  /** Render the stock HTML template (same content in the standalone
    * base+body shape; everything escaped once, Jinja-autoescape style). */
  def renderHtml(title: String, infotext: String,
                 alerts: Seq[Alert]): String =
    Templates.render(stockHtml.source,
      Map("title" -> title, "infotext" -> infotext, "alerts" -> alerts),
      autoescape = stockHtml.autoescape)

  /** The `alerts.log` attachment (alerting_dispatcher.py:133-146):
    * `[<iso created>] <message>`, plus ` | <payload>` when the alert
    * carries data. */
  def renderLogAttachment(alerts: Seq[Alert]): String =
    alerts.map { a =>
      val base = s"[${fmt(a.created, "yyyy-MM-dd'T'HH:mm:ss")}] ${a.message}"
      if (a.payload != null && a.payload.nonEmpty && a.payload != "{}")
        s"$base | ${a.payload}"
      else base
    }.mkString("", System.lineSeparator(), System.lineSeparator())

  /** Wrike task description for one alert (alerting_dispatcher.py:241-263):
    * newlines become `<br/>`, blank separator, optional payload block. */
  def wrikeDescription(a: Alert, addAlertData: Boolean): String = {
    val msg = a.message.replace("\n", "<br/>") + "<br/><br/>"
    // "{}" is the queue's no-data payload — the reference skips empty
    // dicts ('if add_alert_data and alert.data'), as the log attachment
    // above does
    if (addAlertData && a.payload != null && a.payload.nonEmpty
        && a.payload != "{}")
      msg + a.payload.replace("\n", "<br/>") + "<br/><br/>"
    else msg
  }

  // -------------------------------------------------------------- email

  /** Validated SMTP endpoint config; `encryption` is Some("ssl"),
    * Some("starttls"), or None (plain SMTP) — any other STRING is
    * rejected at construction, exactly like dispatcher.py:18-23 (the
    * reference accepts only 'ssl', 'starttls', or Python None). */
  final case class SmtpConfig(host: String, port: Int, user: String,
                              password: String,
                              encryption: Option[String] = None) {
    require(encryption.forall(e => e == "ssl" || e == "starttls"),
      s"""Invalid encryption type "${encryption.get}" for smtp configuration""")
  }

  /** A fully rendered message handed to the transport. */
  final case class EmailMessage(fromEmail: String, toEmail: Seq[String],
                                subject: String, text: Option[String],
                                html: Option[String],
                                attachments: Map[String, String])

  /** Socket boundary — a production impl speaks SMTP per [[SmtpConfig]];
    * tests record. Throw to signal failure (→ re-enqueue upstream). */
  trait EmailTransport extends Serializable {
    def send(message: EmailMessage): Unit
  }

  /** Email mode of the dispatcher: render the configured text and/or
    * html template (at least one must be configured,
    * alerting_dispatcher.py:117-118) with the user's
    * `templateVariables` plus the drained `alerts`
    * (alerting_dispatcher.py:120-121,132), attach the plaintext log,
    * send one message per drained group batch. */
  final class EmailNotifier(transport: EmailTransport, fromEmail: String,
                            toEmail: Seq[String], subject: String,
                            text: Option[Template], html: Option[Template],
                            variables: Map[String, Any] = Map.empty)
      extends Notifier {
    require(text.nonEmpty || html.nonEmpty,
      "You at least have to provide a html or text email template")
    override def send(group: String,
                      alerts: Seq[(java.sql.Timestamp, String, String)]): Unit = {
      val as = alerts.map { case (c, m, p) => Alert(c, m, p) }
      if (as.nonEmpty) {
        val vars = variables + ("alerts" -> as)
        transport.send(EmailMessage(
          fromEmail, toEmail, subject,
          text = text.map(t => Templates.render(t.source, vars, t.autoescape)),
          html = html.map(t => Templates.render(t.source, vars, t.autoescape)),
          attachments = Map("alerts.log" -> renderLogAttachment(as))))
      }
    }
  }

  // ------------------------------------------------------ config parsing

  final case class ConfigurationMissing(what: String)
    extends RuntimeException(s"Missing $what in alert configuration")

  /** Build a Notifier from one dispatcher `configurations` entry — the
    * reference dispatches per entry on `type` ∈ email | wrike
    * (alerting_dispatcher.py:63-99, 181-273), raising on missing
    * required keys. Transports are injected; this only parses.
    *
    * `templateText`/`templateHtml` are template FILE PATHS relative to
    * `templatesRoot` (alerting_dispatcher.py:111-115; only string
    * values count, non-strings are ignored like the reference's
    * type-checks), loaded eagerly so a typo'd path fails at config time;
    * `templateVariables` is the user's dict handed to the renderer with
    * `alerts` added at dispatch (alerting_dispatcher.py:120-121,132). */
  def fromConfig(cfg: Map[String, Any], transport: => EmailTransport,
                 wrike: => WrikeClient,
                 templatesRoot: String = "resources/templates"): Notifier = {
    def str(k: String): Option[String] = cfg.get(k).map(_.toString)
    cfg.getOrElse("type", "email").toString match {
      case "email" =>
        val subject = cfg.get("subject") match {
          case Some(s: String) => s
          case _ => throw ConfigurationMissing("subject")
        }
        val from = str("fromEmail").getOrElse(
          throw ConfigurationMissing("from email"))
        val to = cfg.get("toEmail") match {
          case Some(s: String) => Seq(s)
          case Some(xs: Seq[Any @unchecked]) => xs.map(_.toString)
          case _ => throw ConfigurationMissing("to email")
        }
        def tpl(k: String): Option[Template] = cfg.get(k).collect {
          case p: String =>
            Template(Templates.load(templatesRoot, p), Templates.autoescapes(p))
        }
        val text = tpl("templateText")
        val html = tpl("templateHtml")
        if (text.isEmpty && html.isEmpty)
          throw ConfigurationMissing("html or text email template")
        val variables = cfg.get("templateVariables") match {
          case Some(m: Map[String @unchecked, Any @unchecked]) => m
          case _ => Map.empty[String, Any]
        }
        new EmailNotifier(transport, from, to, subject, text, html, variables)
      case "wrike" =>
        str("apiToken").getOrElse(
          throw ConfigurationMissing("api token for wrike API"))
        val folder = str("folderId").orElse(str("folderSharedId")).getOrElse(
          throw ConfigurationMissing("folder api- or share id for task"))
        val responsibles = cfg.get("responsible") match {
          case Some(xs: Seq[Any @unchecked]) => xs.map(_.toString)
          case Some(one) => Seq(one.toString) // scalar form, like toEmail
          case None => Nil
        }
        new WrikeNotifier(wrike, folder,
          taskTitle = str("taskTitle").getOrElse("graft Alert"),
          responsibles = responsibles,
          addAlertData = cfg.get("addAlertData")
            .forall(_.toString.toBoolean),
          summarise = cfg.get("summariseAlerts")
            .exists(_.toString.toBoolean))
      case other =>
        throw new IllegalArgumentException(
          s"unknown alert configuration type '$other'")
    }
  }

  // -------------------------------------------------------------- wrike

  /** HTTP boundary for the Wrike API (create-task is the only call the
    * dispatcher makes). Throw to signal failure. */
  trait WrikeClient extends Serializable {
    def createTask(folderId: String, title: String, description: String,
                   responsibles: Seq[String]): Unit
  }

  /** Wrike mode: `summarise = false` creates ONE TASK PER ALERT,
    * `summarise = true` concatenates all alerts into one task
    * (alerting_dispatcher.py:241-273). */
  final class WrikeNotifier(client: WrikeClient, folderId: String,
                            taskTitle: String = "graft Alert",
                            responsibles: Seq[String] = Nil,
                            addAlertData: Boolean = true,
                            summarise: Boolean = false) extends Notifier {
    responsibles.find(!graft.core.Validation.validEmail(_)).foreach(bad =>
      throw new IllegalArgumentException(
        s"'$bad' is not a valid email address")) // wrike.py:89
    override def send(group: String,
                      alerts: Seq[(java.sql.Timestamp, String, String)]): Unit = {
      val as = alerts.map { case (c, m, p) => Alert(c, m, p) }
      if (as.isEmpty) ()
      else if (summarise)
        client.createTask(folderId, taskTitle,
          as.map(wrikeDescription(_, addAlertData)).mkString, responsibles)
      else
        as.foreach(a => client.createTask(folderId, taskTitle,
          wrikeDescription(a, addAlertData), responsibles))
    }
  }
}
