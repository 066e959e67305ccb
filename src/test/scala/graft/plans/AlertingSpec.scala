package graft.plans

import java.nio.file.Files
import graft.SparkSpec
import graft.operators.QueryHelper
import graft.sources.QueueStore

class AlertingSpec extends SparkSpec {
  import spark.implicits._

  private val now = java.sql.Timestamp.valueOf("2024-05-01 12:00:00")

  private def registerOrders(): Unit =
    Seq((1L, "O", 100.0), (2L, "F", 900.0), (3L, "O", 50.0))
      .toDF("id", "status", "price").createOrReplaceTempView("t_orders")

  test("named parameters incl. dateDaysAgo") {
    registerOrders()
    val df = QueryHelper.runQuery(spark,
      "SELECT * FROM t_orders WHERE price > :minPrice",
      Map("minPrice" -> 80))
    assert(df.count() === 2)
    val d = QueryHelper.runQuery(spark, "SELECT :d AS d",
      Map("d" -> Map("dateDaysAgo" -> 3)))
      .head().getDate(0)
    assert(d === java.sql.Date.valueOf(java.time.LocalDate.now().minusDays(3)))
    intercept[QueryHelper.InvalidDynamicParameter] {
      QueryHelper.processParameters(Map("x" -> Map("unknownFn" -> 1)))
    }
  }

  test("nested columnMapping rename (top, struct field, array of struct)") {
    val df = Seq((1L, ("a", 2L), Seq(("x", 1L), ("y", 2L))))
      .toDF("id", "rec", "items")
    val out = QueryHelper.renameColumns(df, Map(
      "id" -> "order_id", "rec._1" -> "name", "items._2" -> "qty"))
    assert(out.columns.toSeq === Seq("order_id", "rec", "items"))
    assert(out.select("rec.name").head().getString(0) === "a")
    assert(out.schema("items").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq === Seq("_1", "qty"))
    // unmatched mapping entries are ignored
    assert(QueryHelper.renameColumns(df, Map("nope" -> "x")).columns.toSeq
      === df.columns.toSeq)
  }

  test("per-row mode: alerts on failing rows, logs every row") {
    registerOrders()
    val out = Alerting.runCheck(spark, Alerting.CheckConfig(
      query = "SELECT * FROM t_orders",
      groups = Seq("g1", "g2"),
      message = "order {id} too cheap: {price}",
      checksPerLine = Seq("{price} >= 80"),
      logName = Some("price_check"),
      logMessage = "checked {id}"), now)
    val alerts = out.alerts.collect()
    assert(alerts.length === 2, "1 failing row x 2 groups")
    assert(alerts.map(_.getString(2)).distinct.toSeq
      === Seq("order 3 too cheap: 50.0"))
    assert(alerts.head.getString(3).contains("\"id\":3"))
    val logs = out.logs.collect()
    assert(logs.length === 3)
    assert(logs.count(_.getBoolean(3)) === 2, "two rows pass")
    assert(logs.map(_.getString(2)).sorted.toSeq
      === Seq("checked 1", "checked 2", "checked 3"))
  }

  test("per-row negate inverts firing") {
    registerOrders()
    val out = Alerting.runCheck(spark, Alerting.CheckConfig(
      query = "SELECT * FROM t_orders", negate = true,
      message = "ok row {id}", checksPerLine = Seq("{price} >= 80")), now)
    assert(out.alerts.count() === 2, "negate fires on PASSING rows")
  }

  test("whole-result mode with resultsCount template") {
    registerOrders()
    val fire = Alerting.runCheck(spark, Alerting.CheckConfig(
      query = "SELECT * FROM t_orders WHERE price > 800",
      message = "{resultsCount} expensive orders",
      logName = Some("exp"), logMessage = "found {resultsCount}"), now)
    assert(fire.alerts.count() === 1)
    assert(fire.alerts.head().getString(2) === "1 expensive orders")
    assert(fire.logs.head().getBoolean(3) === false, "firing logs success=false")
    val quiet = Alerting.runCheck(spark, Alerting.CheckConfig(
      query = "SELECT * FROM t_orders WHERE price > 9999",
      message = "none", logName = Some("exp"), logMessage = "m"), now)
    assert(quiet.alerts.count() === 0)
    assert(quiet.logs.head().getBoolean(3) === true)
    val negated = Alerting.runCheck(spark, Alerting.CheckConfig(
      query = "SELECT * FROM t_orders WHERE price > 9999",
      message = "no rows!", negate = true), now)
    assert(negated.alerts.count() === 1, "negate fires on empty result")
  }

  test("dispatcher: delete-on-read, re-enqueue on failure, unhandled kept") {
    val root = Files.createTempDirectory("graft_alert").toString
    val q = new QueueStore(spark, root)
    val alerts = Seq(
      (now, "mail", "m1", "{}"), (now, "mail", "m2", "{}"),
      (now, "wrike", "w1", "{}"), (now, "other", "o1", "{}"))
      .toDF("created", "group", "message", "payload")
    q.enqueue("alerts", alerts)

    val rec = new Alerting.RecordingNotifier
    Alerting.dispatch(spark, q, "alerts", Seq("mail", "wrike"), rec)
    assert(rec.sent.map(_._1).sorted.toSeq === Seq("mail", "wrike"))
    assert(rec.sent.find(_._1 == "mail").get._2.size === 2)
    // unhandled group stays queued
    val left = q.peek("alerts", Alerting.alertSchema).collect()
    assert(left.map(_.getString(1)).toSeq === Seq("other"))

    // failing notifier → everything re-enqueued
    q.clear("alerts"); q.enqueue("alerts", alerts.filter($"group" === "mail"))
    Alerting.dispatch(spark, q, "alerts", Seq("mail"), new Alerting.FailingNotifier)
    assert(q.peek("alerts", Alerting.alertSchema).count() === 2,
      "failure re-enqueues the batch")
  }

  // ------------------------------------------------------- notifications

  import Notifications._

  private def alert(msg: String, payload: String = "{}") =
    Notifications.Alert(java.sql.Timestamp.valueOf("2024-05-01 08:30:00"),
      msg, payload)

  test("email text render: header, one line per alert, cap at 10 + ...") {
    val body = renderText("Alerts", "please check",
      (1 to 12).map(i => alert(s"m$i")))
    assert(body.startsWith("Alerts\n\nplease check\n\n"))
    assert(body.contains("2024-05-01 08:30:00 - m1"))
    assert(body.contains("m10") && !body.contains("m11"),
      "only the first 10 alerts render")
    assert(body.contains("\n..."), "overflow marked with ellipsis")
    val short = renderText("t", "i", Seq(alert("only")))
    assert(!short.contains("..."))
  }

  test("html render escapes markup") {
    val html = renderHtml("T", "i", Seq(alert("<b>&boom</b>")))
    assert(html.contains("&lt;b&gt;&amp;boom&lt;/b&gt;"))
  }

  test("log attachment: iso stamp, payload appended only when present") {
    val log = renderLogAttachment(Seq(
      alert("plain"), alert("with data", """{"k": 1}""")))
    val lines = log.split(System.lineSeparator()).toSeq
    assert(lines(0) === "[2024-05-01T08:30:00] plain")
    assert(lines(1) === """[2024-05-01T08:30:00] with data | {"k": 1}""")
  }

  test("email notifier renders text+log through the transport") {
    val sent = scala.collection.mutable.ArrayBuffer.empty[EmailMessage]
    val transport = new EmailTransport {
      override def send(m: EmailMessage): Unit = sent += m
    }
    val n = new EmailNotifier(transport, "graft@example.com",
      Seq("ops@example.com"), "subject",
      text = Some(stockText), html = Some(stockHtml),
      variables = Map("title" -> "Alerts", "infotext" -> "check these"))
    n.send("mail", Seq((java.sql.Timestamp.valueOf("2024-05-01 08:30:00"),
      "m1", """{"a": 2}""")))
    assert(sent.size === 1)
    assert(sent.head.text.get.contains("m1"))
    assert(sent.head.text.get.startsWith("Alerts\n\ncheck these\n\n"))
    assert(sent.head.html.get.contains("m1"))
    assert(sent.head.attachments("alerts.log").contains("| {\"a\": 2}"))
    intercept[IllegalArgumentException] {
      new EmailNotifier(transport, "f", Seq("t"), "s", None, None)
    }
    intercept[IllegalArgumentException] { SmtpConfig("h", 25, "u", "p", Some("tls")) }
    SmtpConfig("h", 465, "u", "p", Some("ssl")) // valid modes construct
    SmtpConfig("h", 587, "u", "p", Some("starttls"))
  }

  test("wrike notifier: one task per alert vs one summarized task") {
    val tasks = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val client = new WrikeClient {
      override def createTask(folderId: String, title: String,
                              description: String,
                              responsibles: Seq[String]): Unit =
        tasks += (title -> description)
    }
    val batch = Seq(
      (java.sql.Timestamp.valueOf("2024-05-01 08:30:00"), "line1\nline2", """{"x": 1}"""),
      (java.sql.Timestamp.valueOf("2024-05-01 08:31:00"), "second", "{}"))
    new WrikeNotifier(client, "folder1", "Alert").send("wrike", batch)
    assert(tasks.size === 2, "per-alert mode: one task each")
    assert(tasks.head._2.contains("line1<br/>line2<br/><br/>"))
    assert(tasks.head._2.contains("""{"x": 1}"""))

    tasks.clear()
    new WrikeNotifier(client, "folder1", "Alert", summarise = true)
      .send("wrike", batch)
    assert(tasks.size === 1, "summarized mode: one task for the batch")
    assert(tasks.head._2.contains("line1") && tasks.head._2.contains("second"))

    tasks.clear()
    new WrikeNotifier(client, "folder1", "Alert", addAlertData = false)
      .send("wrike", batch.take(1))
    assert(!tasks.head._2.contains("""{"x": 1}"""), "addAlertData=false")
  }

  test("fromConfig builds email/wrike notifiers, rejects missing keys") {
    val sent = scala.collection.mutable.ArrayBuffer.empty[EmailMessage]
    val transport = new EmailTransport {
      override def send(m: EmailMessage): Unit = sent += m
    }
    val tasks = scala.collection.mutable.ArrayBuffer.empty[String]
    val client = new WrikeClient {
      override def createTask(folderId: String, title: String,
                              description: String,
                              responsibles: Seq[String]): Unit =
        tasks += s"$folderId/$title"
    }
    val batch = Seq((now, "m1", "{}"))

    val email = fromConfig(Map(
      "type" -> "email", "fromEmail" -> "f@x", "toEmail" -> Seq("a@x", "b@x"),
      "templateText" -> "alerting_dispatcher/email_alert.txt",
      "templateVariables" -> Map("title" -> "T1", "infotext" -> "I1"),
      "subject" -> "s"), transport, client)
    email.send("mail", batch)
    assert(sent.head.toEmail === Seq("a@x", "b@x"))
    assert(sent.head.text.nonEmpty && sent.head.html.isEmpty)
    assert(sent.head.text.get.startsWith("T1\n\nI1\n\n"),
      "templateVariables reach the template")

    val wrike = fromConfig(Map(
      "type" -> "wrike", "apiToken" -> "t", "folderSharedId" -> "share1",
      "taskTitle" -> "T", "summariseAlerts" -> true), transport, client)
    wrike.send("wrike", batch)
    assert(tasks === Seq("share1/T"))

    intercept[ConfigurationMissing] {  // no subject (checked first, like the reference)
      fromConfig(Map("type" -> "email", "fromEmail" -> "f@x", "toEmail" -> "t@x",
        "templateText" -> "x"), transport, client)
    }
    intercept[ConfigurationMissing] {  // no fromEmail
      fromConfig(Map("type" -> "email", "subject" -> "s", "toEmail" -> "t@x",
        "templateText" -> "x"), transport, client)
    }
    intercept[ConfigurationMissing] {
      fromConfig(Map("type" -> "email", "subject" -> "s", "fromEmail" -> "f@x",
        "toEmail" -> "t@x"), transport, client)  // no template at all
    }
    // non-string template values are ignored, like the reference's
    // type-checks (alerting_dispatcher.py:111-115) — booleans don't count
    intercept[ConfigurationMissing] {
      fromConfig(Map("type" -> "email", "subject" -> "s", "fromEmail" -> "f@x",
        "toEmail" -> "t@x", "templateText" -> true), transport, client)
    }
    // a typo'd template path fails at config time, not at first dispatch
    intercept[IllegalArgumentException] {
      fromConfig(Map("type" -> "email", "subject" -> "s", "fromEmail" -> "f@x",
        "toEmail" -> "t@x", "templateText" -> "no/such_template.txt"),
        transport, client)
    }
    intercept[ConfigurationMissing] {
      fromConfig(Map("type" -> "wrike", "apiToken" -> "t"), transport, client)
    }
  }

  test("custom template file renders bit-exactly with templateVariables") {
    val root = Files.createTempDirectory("graft_templates").toString
    val dir = java.nio.file.Paths.get(root, "my")
    Files.createDirectories(dir)
    Files.write(dir.resolve("digest.txt"),
      ("Hi {{ recipient }},\n\n{% for alert in alerts %}" +
        "{{ loop.index }}. [{{ alert.date|datetime(\"%H:%M\") }}] " +
        "{{ alert.message|e }}{% if alert.data != \"{}\" %} ({{ alert.data }})" +
        "{% endif %}\n{% endfor %}\n-- {{ signature }}\n")
        .getBytes("UTF-8"))
    val sent = scala.collection.mutable.ArrayBuffer.empty[EmailMessage]
    val transport = new EmailTransport {
      override def send(m: EmailMessage): Unit = sent += m
    }
    val n = fromConfig(Map(
      "type" -> "email", "subject" -> "s", "fromEmail" -> "f@x",
      "toEmail" -> "t@x", "templateText" -> "my/digest.txt",
      "templateVariables" -> Map("recipient" -> "Ops", "signature" -> "graft")),
      transport, null, templatesRoot = root)
    n.send("mail", Seq(
      (java.sql.Timestamp.valueOf("2024-05-01 08:30:00"), "a < b", "{}"),
      (java.sql.Timestamp.valueOf("2024-05-01 09:45:00"), "disk full",
        """{"free": 0}""")))
    assert(sent.head.text.get ===
      "Hi Ops,\n\n" +
        "1. [08:30] a &lt; b\n" +
        "2. [09:45] disk full ({&#34;free&#34;: 0})\n" +
        "\n-- graft",  // one trailing template newline stripped, as Jinja does
      "custom template renders bit-exactly (autoescaped .txt, loop.index, " +
        "datetime filter, data conditional)")
  }

  test("failing email transport re-enqueues via the dispatch path") {
    val root = Files.createTempDirectory("graft_alert_mail").toString
    val q = new QueueStore(spark, root)
    q.enqueue("alerts", Seq((now, "mail", "m1", "{}"))
      .toDF("created", "group", "message", "payload"))
    val broken = new EmailTransport {
      override def send(m: EmailMessage): Unit =
        throw new RuntimeException("smtp down")
    }
    val n = new EmailNotifier(broken, "f@x", Seq("t@x"), "s",
      Some(stockText), None, Map("title" -> "T", "infotext" -> "i"))
    Alerting.dispatch(spark, q, "alerts", Seq("mail"), n)
    assert(q.peek("alerts", Alerting.alertSchema).count() === 1,
      "transport failure keeps the alert queued")
  }
}
