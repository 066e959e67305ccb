package graft.tools

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._

/** In-process protocol servers for driving the REAL transports
  * ([[graft.sources.HttpFetcher]], [[graft.plans.SmtpTransport]],
  * [[graft.plans.WrikeHttpClient]]) without egress: integration specs
  * and [[ModuleDebugger]]'s `--real-transport` mode bind them on
  * localhost and exercise the full wire protocol — which is also how
  * the transports should be smoke-tested in any locked-down
  * deployment. */
object DevServers {

  final case class HttpExchange(method: String, path: String, query: String,
                                headers: Map[String, String], body: String)
  final case class HttpReply(status: Int, headers: Map[String, String],
                             body: String)

  /** Tiny HTTP server over the JDK's built-in `com.sun.net.httpserver`.
    * The handler sees every request (recorded for assertions). */
  final class MockHttpServer(handler: HttpExchange => HttpReply) {
    val requests = new java.util.concurrent.CopyOnWriteArrayList[HttpExchange]()
    private val server =
      com.sun.net.httpserver.HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val req = HttpExchange(ex.getRequestMethod,
        ex.getRequestURI.getPath,
        Option(ex.getRequestURI.getRawQuery).getOrElse(""),
        ex.getRequestHeaders.asScala.map { case (k, v) =>
          k -> v.asScala.mkString(", ") }.toMap,
        new String(ex.getRequestBody.readAllBytes(), UTF_8))
      requests.add(req)
      val reply = handler(req)
      reply.headers.foreach { case (k, v) =>
        ex.getResponseHeaders.add(k, v) }
      val bytes = reply.body.getBytes(UTF_8)
      // 204/304 take no body; everything else sends the handler's bytes
      if (reply.status == 204 || reply.status == 304)
        ex.sendResponseHeaders(reply.status, -1)
      else {
        ex.sendResponseHeaders(reply.status, if (bytes.isEmpty) -1 else bytes.length)
        if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      }
      ex.close()
    })
    server.start()
    def port: Int = server.getAddress.getPort
    def base: String = s"http://127.0.0.1:$port"
    def stop(): Unit = server.stop(0)
  }

  /** One delivered SMTP message: envelope + raw DATA payload. */
  final case class SmtpDelivery(from: String, rcpts: Seq[String],
                                data: String, authUser: String,
                                authPass: String)

  /** Minimal single-threaded SMTP server: greeting, EHLO (advertising
    * AUTH LOGIN), optional AUTH LOGIN exchange, envelope, dot-terminated
    * DATA, QUIT. Accepts connections until stopped; records every
    * delivery. Plaintext only — TLS modes need a certificate and are
    * exercised against real relays. */
  final class MockSmtpServer {
    val deliveries = new java.util.concurrent.CopyOnWriteArrayList[SmtpDelivery]()
    private val server = new ServerSocket(0, 8,
      java.net.InetAddress.getByName("127.0.0.1"))
    @volatile private var running = true

    private val acceptor = new Thread(() => {
      while (running)
        try serve(server.accept())
        catch { case _: Exception => () } // closed socket on stop()
    }, "mock-smtp")
    acceptor.setDaemon(true)
    acceptor.start()

    private def serve(socket: Socket): Unit = {
      val in = new BufferedReader(new InputStreamReader(socket.getInputStream, UTF_8))
      val out = new OutputStreamWriter(socket.getOutputStream, UTF_8)
      def reply(s: String): Unit = { out.write(s + "\r\n"); out.flush() }
      def b64d(s: String): String =
        new String(java.util.Base64.getDecoder.decode(s), UTF_8)
      reply("220 mock ESMTP")
      var from = ""; var user = ""; var pass = ""
      val rcpts = Vector.newBuilder[String]
      var line = in.readLine()
      while (line != null) {
        val upper = line.toUpperCase
        if (upper.startsWith("EHLO") || upper.startsWith("HELO")) {
          reply("250-mock greets you"); reply("250 AUTH LOGIN PLAIN")
        } else if (upper.startsWith("AUTH LOGIN")) {
          reply("334 VXNlcm5hbWU6") // "Username:"
          user = b64d(in.readLine())
          reply("334 UGFzc3dvcmQ6") // "Password:"
          pass = b64d(in.readLine())
          reply("235 2.7.0 accepted")
        } else if (upper.startsWith("MAIL FROM:")) {
          from = line.drop("MAIL FROM:".length).trim.stripPrefix("<").stripSuffix(">")
          reply("250 ok")
        } else if (upper.startsWith("RCPT TO:")) {
          rcpts += line.drop("RCPT TO:".length).trim.stripPrefix("<").stripSuffix(">")
          reply("250 ok")
        } else if (upper.startsWith("DATA")) {
          reply("354 end with <CRLF>.<CRLF>")
          val sb = new StringBuilder
          var l = in.readLine()
          while (l != null && l != ".") {
            sb.append(if (l.startsWith("..")) l.drop(1) else l).append("\r\n")
            l = in.readLine()
          }
          deliveries.add(SmtpDelivery(from, rcpts.result(), sb.toString, user, pass))
          reply("250 queued")
        } else if (upper.startsWith("QUIT")) {
          reply("221 bye")
          socket.close()
          return
        } else reply("250 ok") // NOOP/RSET/etc.
        line = in.readLine()
      }
    }

    def port: Int = server.getLocalPort
    def stop(): Unit = { running = false; server.close() }
  }
}
