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

  /** Text body with the reference template's semantics: title and
    * infotext paragraphs, then `<ts> - <message>` per alert, at most 10
    * lines then an ellipsis (the template's `loop.index` break). */
  def renderText(title: String, infotext: String,
                 alerts: Seq[Alert]): String = {
    val lines = alerts.take(10)
      .map(a => s"${fmt(a.created, "yyyy-MM-dd HH:mm:ss")} - ${a.message}")
    val tail = if (alerts.size > 10) "\n..." else ""
    s"$title\n\n$infotext\n\n${lines.mkString("\n")}$tail\n"
  }

  /** HTML alternative: same content, `<br/>` line breaks, messages
    * HTML-escaped (the text template escapes with `|e` too). */
  def renderHtml(title: String, infotext: String,
                 alerts: Seq[Alert]): String = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;")
    val lines = alerts.take(10)
      .map(a => s"${fmt(a.created, "yyyy-MM-dd HH:mm:ss")} - ${esc(a.message)}")
    val tail = if (alerts.size > 10) "<br/>..." else ""
    s"<html><body><h1>${esc(title)}</h1><p>${esc(infotext)}</p>" +
      s"<p>${lines.mkString("<br/>")}$tail</p></body></html>"
  }

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

  /** Email mode of the dispatcher: render text and/or html (at least one
    * template must be configured, alerting_dispatcher.py:117-118), attach
    * the plaintext log, send one message per drained group batch. */
  final class EmailNotifier(transport: EmailTransport, fromEmail: String,
                            toEmail: Seq[String], subject: String,
                            title: String, infotext: String,
                            withText: Boolean = true,
                            withHtml: Boolean = false) extends Notifier {
    require(withText || withHtml,
      "You at least have to provide a html or text email template")
    override def send(group: String,
                      alerts: Seq[(java.sql.Timestamp, String, String)]): Unit = {
      val as = alerts.map { case (c, m, p) => Alert(c, m, p) }
      if (as.nonEmpty)
        transport.send(EmailMessage(
          fromEmail, toEmail, subject,
          text = if (withText) Some(renderText(title, infotext, as)) else None,
          html = if (withHtml) Some(renderHtml(title, infotext, as)) else None,
          attachments = Map("alerts.log" -> renderLogAttachment(as))))
    }
  }

  // ------------------------------------------------------ config parsing

  final case class ConfigurationMissing(what: String)
    extends RuntimeException(s"Missing $what in alert configuration")

  /** Build a Notifier from one dispatcher `configurations` entry — the
    * reference dispatches per entry on `type` ∈ email | wrike
    * (alerting_dispatcher.py:63-99, 181-273), raising on missing
    * required keys. Transports are injected; this only parses. */
  def fromConfig(cfg: Map[String, Any], transport: => EmailTransport,
                 wrike: => WrikeClient): Notifier = {
    def str(k: String): Option[String] = cfg.get(k).map(_.toString)
    cfg.getOrElse("type", "email").toString match {
      case "email" =>
        val from = str("fromEmail").getOrElse(
          throw ConfigurationMissing("from email"))
        val to = cfg.get("toEmail") match {
          case Some(s: String) => Seq(s)
          case Some(xs: Seq[Any @unchecked]) => xs.map(_.toString)
          case _ => throw ConfigurationMissing("to email")
        }
        val withText = cfg.contains("templateText")
        val withHtml = cfg.contains("templateHtml")
        if (!withText && !withHtml)
          throw ConfigurationMissing("html or text email template")
        new EmailNotifier(transport, from, to,
          subject = str("subject").getOrElse("graft Alert"),
          title = str("title").getOrElse("Alerts"),
          infotext = str("infotext").getOrElse(""),
          withText = withText, withHtml = withHtml)
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
