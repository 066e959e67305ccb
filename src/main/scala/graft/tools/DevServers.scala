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

  /** Minimal in-process Chrome DevTools endpoint for driving the real
    * [[graft.sources.CdpRenderer]] without a browser: the HTTP tab
    * control surface (`PUT|GET /json/new`, `GET /json/close/<id>`) and
    * a real RFC6455 WebSocket upgrade + frame loop speaking enough CDP
    * for the render sequence — `Page.enable`, `Page.navigate` (url
    * recorded, load event fired unless `fireLoadEvent` is off),
    * `Runtime.evaluate` answered with `pages(<navigated url>)`.
    * `refuseTabs` drives the endpoint-down path. Handles the JDK
    * client's masked frames, fragmentation-free text replies, ping and
    * close. */
  final class MockDevtoolsServer(pages: String => String,
                                 fireLoadEvent: Boolean = true,
                                 refuseTabs: Boolean = false) {
    val navigated = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val closedTabs = new java.util.concurrent.CopyOnWriteArrayList[String]()
    // concurrency gauge: tabs open right now / high-water mark — what a
    // pacing/parallelism spec asserts against
    val openTabs = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxOpenTabs = new java.util.concurrent.atomic.AtomicInteger(0)
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    private val server = new ServerSocket(0, 8,
      java.net.InetAddress.getByName("127.0.0.1"))
    @volatile private var running = true

    private val acceptor = new Thread(() => {
      while (running)
        try {
          val s = server.accept()
          val t = new Thread(() => try serve(s) catch { case _: Exception => () },
            "mock-devtools-conn")
          t.setDaemon(true)
          t.start()
        } catch { case _: Exception => () } // closed socket on stop()
    }, "mock-devtools")
    acceptor.setDaemon(true)
    acceptor.start()

    def port: Int = server.getLocalPort
    def base: String = s"http://127.0.0.1:$port"
    def stop(): Unit = { running = false; server.close() }

    /** Byte-wise CRLF line read — a buffered reader would swallow the
      * binary frames that follow the upgrade. */
    private def readLine(in: java.io.InputStream): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c != -1 && c != '\n') {
        if (c != '\r') sb.append(c.toChar)
        c = in.read()
      }
      sb.toString
    }

    private def serve(socket: Socket): Unit = {
      val in = socket.getInputStream
      val out = socket.getOutputStream
      val requestLine = readLine(in)
      if (requestLine.isEmpty) { socket.close(); return }
      val parts = requestLine.split(" ")
      val (method, path) = (parts(0), parts(1))
      var headers = Map.empty[String, String]
      var line = readLine(in)
      while (line.nonEmpty) {
        val i = line.indexOf(':')
        if (i > 0) headers += (line.take(i).trim.toLowerCase ->
          line.drop(i + 1).trim)
        line = readLine(in)
      }
      def httpReply(status: Int, body: String,
                    contentType: String = "application/json"): Unit = {
        val bytes = body.getBytes(UTF_8)
        out.write((s"HTTP/1.1 $status OK\r\nContent-Type: $contentType\r\n" +
          s"Content-Length: ${bytes.length}\r\nConnection: close\r\n\r\n")
          .getBytes(UTF_8))
        out.write(bytes)
        out.flush()
        socket.close()
      }
      if (path.startsWith("/json/new")) {
        if (refuseTabs) httpReply(500, "{\"error\":\"no tabs\"}")
        else {
          val id = s"tab${System.nanoTime()}"
          maxOpenTabs.accumulateAndGet(openTabs.incrementAndGet(), math.max)
          httpReply(200, s"""{"id":"$id","webSocketDebuggerUrl":""" +
            s""""ws://127.0.0.1:$port/devtools/page/$id"}""")
        }
      } else if (path.startsWith("/json/close/")) {
        openTabs.decrementAndGet()
        closedTabs.add(path.stripPrefix("/json/close/"))
        httpReply(200, "Target is closing", "text/plain")
        ()
      } else if (path.startsWith("/devtools/page/") &&
          headers.get("upgrade").exists(_.equalsIgnoreCase("websocket"))) {
        wsSession(socket, in, out, headers("sec-websocket-key"))
      } else httpReply(404, "{}")
    }

    private def wsSession(socket: Socket, in: java.io.InputStream,
                          out: java.io.OutputStream, key: String): Unit = {
      val accept = java.util.Base64.getEncoder.encodeToString(
        java.security.MessageDigest.getInstance("SHA-1").digest(
          (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").getBytes(UTF_8)))
      out.write(("HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n" +
        s"Connection: Upgrade\r\nSec-WebSocket-Accept: $accept\r\n\r\n")
        .getBytes(UTF_8))
      out.flush()
      def sendFrame(opcode: Int, payload: Array[Byte]): Unit =
        out.synchronized {
          out.write(0x80 | opcode)
          val n = payload.length
          if (n < 126) out.write(n)
          else if (n < 65536) {
            out.write(126); out.write(n >> 8); out.write(n & 0xff)
          } else {
            out.write(127)
            (7 to 0 by -1).foreach(i => out.write(((n.toLong >> (8 * i)) & 0xff).toInt))
          }
          out.write(payload)
          out.flush()
        }
      def sendText(s: String): Unit = sendFrame(0x1, s.getBytes(UTF_8))
      def readN(n: Int): Array[Byte] = {
        val b = new Array[Byte](n)
        var off = 0
        while (off < n) {
          val r = in.read(b, off, n - off)
          if (r < 0) throw new java.io.EOFException
          off += r
        }
        b
      }
      var lastUrl = ""
      var open = true
      while (open) {
        val b0 = in.read()
        if (b0 < 0) return
        val opcode = b0 & 0x0f
        val b1 = in.read()
        val masked = (b1 & 0x80) != 0
        var len: Long = b1 & 0x7f
        if (len == 126) { val e = readN(2)
          len = ((e(0) & 0xffL) << 8) | (e(1) & 0xffL) }
        else if (len == 127) {
          len = readN(8).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL)) }
        val mask = if (masked) readN(4) else Array.empty[Byte]
        val payload = readN(len.toInt)
        if (masked) payload.indices.foreach(i =>
          payload(i) = (payload(i) ^ mask(i % 4)).toByte)
        opcode match {
          case 0x8 => // close: echo and end
            sendFrame(0x8, payload.take(2)); open = false; socket.close()
          case 0x9 => sendFrame(0xA, payload) // ping → pong
          case 0x1 =>
            val msg = mapper.readTree(new String(payload, UTF_8))
            val id = msg.path("id").asInt(-1)
            msg.path("method").asText("") match {
              case "Page.enable" =>
                sendText(s"""{"id":$id,"result":{}}""")
              case "Page.navigate" =>
                lastUrl = msg.path("params").path("url").asText("")
                navigated.add(lastUrl)
                sendText(s"""{"id":$id,"result":{"frameId":"F1"}}""")
                if (fireLoadEvent)
                  sendText("""{"method":"Page.loadEventFired",""" +
                    """"params":{"timestamp":1.0}}""")
              case "Runtime.evaluate" =>
                val node = mapper.createObjectNode()
                node.put("id", id)
                node.putObject("result").putObject("result")
                  .put("type", "string").put("value", pages(lastUrl))
                sendText(mapper.writeValueAsString(node))
              case other =>
                sendText(s"""{"id":$id,"result":{}}""")
            }
          case _ => () // ignore continuation/binary in this fake
        }
      }
    }
  }
}
