package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8
import graft.plans.Notifications._
import graft.tools.DevServers.{HttpReply, MockHttpServer, MockSmtpServer}

/** The REAL notification transports against in-process servers: full
  * SMTP session (greeting → EHLO → AUTH LOGIN → envelope → DATA → QUIT)
  * and the Wrike create-task HTTP call. */
class SmtpTransportSpec extends AnyFunSuite {

  private def b64d(s: String) =
    new String(java.util.Base64.getDecoder.decode(
      s.replaceAll("\\s", "")), UTF_8)

  test("smtp: full authenticated session delivers a well-formed MIME message") {
    val srv = new MockSmtpServer
    try {
      val t = new SmtpTransport(SmtpConfig("127.0.0.1", srv.port,
        "mailer@example.com", "hunter2", encryption = None))
      t.send(EmailMessage(
        fromEmail = "alerts@example.com",
        toEmail = Seq("ops@example.com", "oncall@example.com"),
        subject = "Alert digest",
        text = Some("3 checks failed\nsee attachment"),
        html = Some("<b>3 checks failed</b>"),
        attachments = Map("alerts.log" -> "line1\nline2")))
      assert(srv.deliveries.size() === 1)
      val d = srv.deliveries.get(0)
      assert(d.from === "alerts@example.com")
      assert(d.rcpts === Seq("ops@example.com", "oncall@example.com"))
      assert(d.authUser === "mailer@example.com" && d.authPass === "hunter2")
      // MIME structure: headers, alternative text→html, attachment
      assert(d.data.contains("Subject: Alert digest"))
      assert(d.data.contains("multipart/mixed"))
      assert(d.data.contains("multipart/alternative"))
      assert(d.data.contains("""filename="alerts.log""""))
      val b64Blocks = d.data.split("\r\n\r\n").toSeq.filter(b =>
        b.takeWhile(_ != '\r').matches("[A-Za-z0-9+/=\\s]+") && b.trim.nonEmpty)
      val decoded = b64Blocks.flatMap(b =>
        scala.util.Try(b64d(b.linesIterator.takeWhile(!_.startsWith("--"))
          .mkString)).toOption)
      assert(decoded.exists(_.contains("3 checks failed")), "text part decodes")
      assert(decoded.exists(_.contains("<b>3 checks failed</b>")), "html part decodes")
      assert(decoded.exists(_.contains("line1\nline2")), "attachment decodes")
    } finally srv.stop()
  }

  test("smtp: unauthenticated relay (empty user) skips AUTH") {
    val srv = new MockSmtpServer
    try {
      val t = new SmtpTransport(SmtpConfig("127.0.0.1", srv.port, "", ""))
      t.send(EmailMessage("a@x.com", Seq("b@x.com"), "s",
        Some("body"), None, Map.empty))
      val d = srv.deliveries.get(0)
      assert(d.authUser === "" && d.authPass === "")
      assert(d.data.contains("Subject: s"))
    } finally srv.stop()
  }

  test("smtp: non-ASCII subject is RFC 2047 encoded, UTF-8 body round-trips") {
    val srv = new MockSmtpServer
    try {
      val t = new SmtpTransport(SmtpConfig("127.0.0.1", srv.port, "", ""))
      t.send(EmailMessage("a@x.com", Seq("b@x.com"), "Störung: 3 Prüfungen",
        Some("Die Prüfung enthält Umlaute: äöü"), None, Map.empty))
      val d = srv.deliveries.get(0)
      val subj = d.data.linesIterator.find(_.startsWith("Subject:")).get
      assert(subj.contains("=?UTF-8?B?"))
      assert(b64d(subj.replaceAll(".*\\?B\\?|\\?=.*", ""))
        === "Störung: 3 Prüfungen")
    } finally srv.stop()
  }

  test("smtp: a refused connection throws (upstream re-enqueues the batch)") {
    val srv = new MockSmtpServer
    val port = srv.port
    srv.stop()
    val t = new SmtpTransport(SmtpConfig("127.0.0.1", port, "u", "p"))
    intercept[Exception] {
      t.send(EmailMessage("a@x.com", Seq("b@x.com"), "s",
        Some("x"), None, Map.empty))
    }
  }

  test("smtp: the notifier renders templates through the real transport") {
    val srv = new MockSmtpServer
    try {
      val t = new SmtpTransport(SmtpConfig("127.0.0.1", srv.port, "", ""))
      val notifier = new EmailNotifier(t, "alerts@example.com",
        Seq("ops@example.com"), "digest",
        text = Some(Template(
          "{% for alert in alerts %}{{ alert.message }}\n{% endfor %}")),
        html = None)
      notifier.send("g", Seq(
        (java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), "disk full", "{}"),
        (java.sql.Timestamp.valueOf("2026-01-01 00:01:00"), "cpu hot", "{}")))
      val d = srv.deliveries.get(0)
      val decoded = d.data.split("\r\n\r\n").toSeq.flatMap(b =>
        scala.util.Try(b64d(b.linesIterator.takeWhile(!_.startsWith("--"))
          .mkString)).toOption)
      assert(decoded.contains("disk full\ncpu hot\n"),
        s"rendered template must arrive as a MIME part, got: $decoded")
    } finally srv.stop()
  }

  test("wrike: create-task posts the reference JSON shape with bearer auth") {
    val srv = new MockHttpServer(_ => HttpReply(200,
      Map("Content-Type" -> "application/json"),
      """{"kind":"tasks","data":[{"id":"T1"}]}"""))
    try {
      val c = new WrikeHttpClient("tok123", s"${srv.base}/api/v4")
      c.createTask("F9", "graft Alert", "<b>message</b>",
        Seq("dev@example.com"))
      val req = srv.requests.get(0)
      assert(req.method === "POST")
      assert(req.path === "/api/v4/folders/F9/tasks")
      assert(req.headers.exists { case (k, v) =>
        k.equalsIgnoreCase("authorization") && v == "bearer tok123" })
      assert(req.body.contains(""""title":"graft Alert""""))
      assert(req.body.contains(""""responsibles":["dev@example.com"]"""))
    } finally srv.stop()
  }

  test("wrike: non-200 and malformed data throw (→ re-enqueue upstream)") {
    val bad = new java.util.concurrent.atomic.AtomicInteger(0)
    val srv = new MockHttpServer(_ =>
      if (bad.get() == 0) HttpReply(500, Map.empty, "boom")
      else HttpReply(200, Map.empty, """{"data":[]}"""))
    try {
      val c = new WrikeHttpClient("tok", s"${srv.base}/api/v4")
      val e1 = intercept[RuntimeException](c.createTask("F", "t", "d", Nil))
      assert(e1.getMessage.contains("500"))
      bad.incrementAndGet()
      val e2 = intercept[RuntimeException](c.createTask("F", "t", "d", Nil))
      assert(e2.getMessage === "Failed to create task")
      intercept[IllegalArgumentException](c.createTask("F", "", "d", Nil))
    } finally srv.stop()
  }
}
