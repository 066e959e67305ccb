package graft.plans

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import javax.net.ssl.SSLSocketFactory
import graft.plans.Notifications.{EmailMessage, EmailTransport, SmtpConfig}

/** Real SMTP transport for the [[Notifications.EmailTransport]]
  * boundary — the production counterpart of the test transports,
  * matching the reference dispatcher's connection semantics
  * (service/email/dispatcher.py:17-36):
  *
  *  - `encryption = Some("ssl")` connects TLS-from-the-first-byte
  *    (smtplib.SMTP_SSL), `Some("starttls")` upgrades after EHLO,
  *    `None` stays plaintext (the config type already rejects anything
  *    else, [[SmtpConfig]]);
  *  - credentials log in via AUTH LOGIN when a user is configured
  *    (dispatcher.py:26-29 logs in unconditionally; we skip the
  *    exchange for an empty user so unauthenticated relays work);
  *  - failures THROW — the dispatcher contract is throw ⇒ the alert
  *    batch re-enqueues (queue.py:38-62 semantics, already handled
  *    upstream by [[Alerting]]).
  *
  * The MIME body is built by hand (no mail library in the stack):
  * multipart/mixed wrapping a multipart/alternative (text then html —
  * alternative parts ascend in preference order) plus each attachment
  * base64-encoded, matching the reference's MIMEMultipart assembly
  * (dispatcher.py:39-76). All text transfers as base64 UTF-8, so no
  * line-length or 8-bit pitfalls; header values with non-ASCII use RFC
  * 2047 B-encoding.
  *
  * No egress exists in this environment — NotificationsSpec drives the
  * full session (greeting, EHLO, AUTH, envelope, DATA, QUIT) against an
  * in-process SMTP server, which is also how the transport should be
  * smoke-tested in any deployment. */
final class SmtpTransport(cfg: SmtpConfig, heloHost: String = "graft.local",
                          timeoutMs: Int = 30000) extends EmailTransport {

  /** A raw JSSE SSLSocket does NOT verify that the peer certificate
    * matches the host it dialed unless endpoint identification is
    * switched on — without this, any CA-signed certificate for any
    * name passes the handshake and AUTH LOGIN credentials go to a
    * MITM. HTTPS-style rules (RFC 2818 wildcard matching) are the
    * standard choice for SMTP-over-TLS clients. */
  private def withHostnameVerification(
      s: javax.net.ssl.SSLSocket): javax.net.ssl.SSLSocket = {
    val p = s.getSSLParameters
    p.setEndpointIdentificationAlgorithm("HTTPS")
    s.setSSLParameters(p)
    s
  }

  override def send(message: EmailMessage): Unit = {
    require(message.toEmail.nonEmpty, "no recipients")
    val plain =
      if (cfg.encryption.contains("ssl"))
        withHostnameVerification(
          SSLSocketFactory.getDefault.createSocket(cfg.host, cfg.port)
            .asInstanceOf[javax.net.ssl.SSLSocket])
      else new Socket(cfg.host, cfg.port)
    plain.setSoTimeout(timeoutMs)
    var socket: Socket = plain
    try {
      var io = new SmtpIo(socket)
      io.expect(220)
      io.command(s"EHLO $heloHost", 250)
      if (cfg.encryption.contains("starttls")) {
        io.command("STARTTLS", 220)
        socket = withHostnameVerification(
          SSLSocketFactory.getDefault.asInstanceOf[SSLSocketFactory]
            .createSocket(socket, cfg.host, cfg.port, true)
            .asInstanceOf[javax.net.ssl.SSLSocket])
        io = new SmtpIo(socket)
        io.command(s"EHLO $heloHost", 250) // capabilities reset post-TLS
      }
      if (cfg.user.nonEmpty) {
        io.command("AUTH LOGIN", 334)
        io.command(b64(cfg.user), 334)
        io.command(b64(cfg.password), 235)
      }
      io.command(s"MAIL FROM:<${message.fromEmail}>", 250)
      message.toEmail.foreach(r => io.command(s"RCPT TO:<$r>", 250))
      io.command("DATA", 354)
      io.data(mime(message))
      io.expect(250)
      io.command("QUIT", 221)
    } finally socket.close()
  }

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(UTF_8))

  private def b64Mime(s: String): String =
    Base64.getMimeEncoder.encodeToString(s.getBytes(UTF_8))

  /** RFC 2047 B-encoding for non-ASCII header values. */
  private def headerValue(s: String): String =
    if (s.forall(c => c >= 0x20 && c < 0x7f)) s else s"=?UTF-8?B?${b64(s)}?="

  private[plans] def mime(m: EmailMessage): String = {
    val mixed = s"graft-mixed-${m.subject.hashCode.toHexString}"
    val alt = s"graft-alt-${m.subject.hashCode.toHexString}"
    val sb = new StringBuilder
    def line(s: String): Unit = { sb.append(s).append("\r\n"); () }
    line(s"From: ${m.fromEmail}")
    line(s"To: ${m.toEmail.mkString(", ")}")
    line(s"Subject: ${headerValue(m.subject)}")
    line("MIME-Version: 1.0")
    line(s"""Content-Type: multipart/mixed; boundary="$mixed"""")
    line("")
    line(s"--$mixed")
    line(s"""Content-Type: multipart/alternative; boundary="$alt"""")
    line("")
    // alternative parts ascend in preference: text first, html last
    Seq(m.text.map(("text/plain", _)), m.html.map(("text/html", _)))
      .flatten.foreach { case (ct, body) =>
        line(s"--$alt")
        line(s"Content-Type: $ct; charset=UTF-8")
        line("Content-Transfer-Encoding: base64")
        line("")
        line(b64Mime(body))
      }
    line(s"--$alt--")
    m.attachments.foreach { case (name, content) =>
      line(s"--$mixed")
      line(s"Content-Type: text/plain; charset=UTF-8")
      line(s"""Content-Disposition: attachment; filename="$name"""")
      line("Content-Transfer-Encoding: base64")
      line("")
      line(b64Mime(content))
    }
    line(s"--$mixed--")
    sb.toString
  }

  /** Line-oriented SMTP exchange over one socket. */
  private final class SmtpIo(socket: Socket) {
    private val in = new BufferedReader(
      new InputStreamReader(socket.getInputStream, UTF_8))
    private val out = new OutputStreamWriter(socket.getOutputStream, UTF_8)

    /** Read one (possibly multiline `NNN-`) reply; require its code. */
    def expect(code: Int): Unit = {
      var line = in.readLine()
      if (line == null) throw new java.io.IOException("SMTP: connection closed")
      val first = line
      while (line != null && line.length >= 4 && line.charAt(3) == '-')
        line = in.readLine()
      val got = first.take(3)
      if (got != code.toString)
        throw new java.io.IOException(s"SMTP: expected $code, got '$first'")
    }

    def command(cmd: String, code: Int): Unit = {
      out.write(cmd + "\r\n"); out.flush()
      expect(code)
    }

    /** Transmit a DATA payload with dot-stuffing and the final dot. */
    def data(payload: String): Unit = {
      payload.split("\r\n", -1).foreach { l =>
        out.write(if (l.startsWith(".")) "." + l else l)
        out.write("\r\n")
      }
      out.write(".\r\n")
      out.flush()
    }
  }
}
