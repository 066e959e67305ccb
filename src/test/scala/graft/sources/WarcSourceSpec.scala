package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** WARC archive ingestion: record framing, the HTTP envelope split,
  * gzip multi-member archives, body caps, and the error-row (never
  * throw) contract — all against synthetic archives built byte-by-byte
  * in the test (the format is fully specified; no fixture files). */
class WarcSourceSpec extends SparkSpec {
  import spark.implicits._

  private def warcRecord(tpe: String, content: Array[Byte],
                         uri: String = null,
                         contentType: String = null): Array[Byte] = {
    val h = new StringBuilder
    h ++= "WARC/1.0\r\n"
    h ++= s"WARC-Type: $tpe\r\n"
    if (uri != null) h ++= s"WARC-Target-URI: $uri\r\n"
    h ++= "WARC-Date: 2024-01-01T00:00:00Z\r\n"
    h ++= s"WARC-Record-ID: <urn:uuid:rec-$tpe>\r\n"
    if (contentType != null) h ++= s"Content-Type: $contentType\r\n"
    h ++= s"Content-Length: ${content.length}\r\n\r\n"
    h.toString.getBytes(UTF_8) ++ content ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def httpResponse(status: String, headers: Seq[(String, String)],
                           payload: String): Array[Byte] =
    (s"HTTP/1.1 $status\r\n" +
      headers.map { case (k, v) => s"$k: $v\r\n" }.mkString +
      "\r\n" + payload).getBytes(UTF_8)

  private val html = "<html><body>hello crawl</body></html>"
  private def archive: Array[Byte] =
    warcRecord("warcinfo", "software: test\r\n".getBytes(UTF_8)) ++
    warcRecord("request",
      "GET / HTTP/1.1\r\nHost: example.com\r\n\r\n".getBytes(UTF_8),
      uri = "http://example.com/", contentType = "application/http") ++
    warcRecord("response",
      httpResponse("200 OK", Seq("Content-Type" -> "text/html; charset=utf-8",
        "X-Crawl" -> "cc"), html),
      uri = "http://example.com/",
      contentType = "application/http; msgtype=response")

  private def write(name: String, bytes: Array[Byte]): String = {
    val dir = Files.createTempDirectory("graft_warc_")
    val p = dir.resolve(name)
    Files.write(p, bytes)
    p.toString
  }

  private def gzipMembers(records: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { r => // one gzip member per record — the CC layout
      val gz = new GZIPOutputStream(out)
      gz.write(r); gz.finish()
    }
    out.toByteArray
  }

  test("plain archive: three records, response envelope split") {
    val df = WarcSource.read(spark, write("a.warc", archive))
    assert(df.count() === 3)
    assert(df.filter(col("error").isNotNull).count() === 0)
    val r = df.filter(col("warc_type") === "response").head()
    assert(r.getAs[String]("url") === "http://example.com/")
    assert(r.getAs[Int]("http_status") === 200)
    assert(r.getAs[String]("content_type") === "text/html; charset=utf-8")
    assert(r.getAs[Map[String, String]]("headers")("x-crawl") === "cc")
    assert(new String(r.getAs[Array[Byte]]("body"), UTF_8) === html)
    assert(!r.getAs[Boolean]("truncated"))
    // non-http records keep their raw content
    val info = df.filter(col("warc_type") === "warcinfo").head()
    assert(new String(info.getAs[Array[Byte]]("body"), UTF_8)
      === "software: test\r\n")
  }

  test("gzip multi-member archive parses identically") {
    // byte bodies decoded for comparison — Row.toString prints array
    // identity, not contents
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = df
      .drop("archive")
      .withColumn("body", decode(col("body"), "UTF-8"))
      .collect().toSeq.map(_.toString)
    val plain = canon(WarcSource.read(spark, write("a.warc", archive)))
    val gz = canon(WarcSource.read(spark,
        write("a.warc.gz", gzipMembers(
          warcRecord("warcinfo", "software: test\r\n".getBytes(UTF_8)),
          warcRecord("request",
            "GET / HTTP/1.1\r\nHost: example.com\r\n\r\n".getBytes(UTF_8),
            uri = "http://example.com/", contentType = "application/http"),
          warcRecord("response",
            httpResponse("200 OK",
              Seq("Content-Type" -> "text/html; charset=utf-8",
                "X-Crawl" -> "cc"), html),
            uri = "http://example.com/",
            contentType = "application/http; msgtype=response")))))
    assert(gz === plain)
  }

  test("body cap truncates and flags, never buffers past the cap") {
    val big = "x" * 5000
    val rec = warcRecord("response",
      httpResponse("200 OK", Seq("Content-Type" -> "text/plain"), big),
      uri = "http://example.com/big",
      contentType = "application/http; msgtype=response") ++
      warcRecord("warcinfo", "after: big\r\n".getBytes(UTF_8))
    val df = WarcSource.read(spark, write("b.warc", rec), maxBodyBytes = 512)
    val r = df.filter(col("warc_type") === "response").head()
    assert(r.getAs[Boolean]("truncated"))
    assert(r.getAs[Array[Byte]]("body").length < 512) // envelope came off
    // framing survives the truncation: the NEXT record still parses
    assert(df.filter(col("warc_type") === "warcinfo").count() === 1)
  }

  test("lost framing yields one error row, parsed prefix survives") {
    val broken = warcRecord("warcinfo", "ok: 1\r\n".getBytes(UTF_8)) ++
      "this is not a warc record\r\n".getBytes(UTF_8)
    val df = WarcSource.read(spark, write("c.warc", broken))
    assert(df.filter(col("error").isNull).count() === 1)
    val e = df.filter(col("error").isNotNull).head()
    assert(e.getAs[String]("error").contains("expected WARC/"))
  }

  test("bad http envelope keeps the record with its error noted") {
    val rec = warcRecord("response", "NOT HTTP AT ALL".getBytes(UTF_8),
      uri = "http://example.com/",
      contentType = "application/http; msgtype=response")
    val df = WarcSource.read(spark, write("d.warc", rec))
    val r = df.head()
    assert(r.getAs[String]("error") != null)
    assert(r.getAs[String]("url") === "http://example.com/")
  }

  test("readResponses: undecodable bytes become replacement chars, not nulls") {
    // a latin-1 page served with no charset: the 0xE9 byte is invalid
    // UTF-8 — the doc must SURVIVE (lossy-decoded), not vanish as null
    val payload = "caf".getBytes(UTF_8) ++ Array(0xE9.toByte) ++
      " page".getBytes(UTF_8)
    val rec = warcRecord("response",
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n").getBytes(UTF_8)
        ++ payload,
      uri = "http://example.com/l1",
      contentType = "application/http; msgtype=response")
    val t = WarcSource.readResponses(spark, write("g.warc", rec))
      .select("text").as[String].collect().toSeq
    assert(t.length === 1 && t.head != null)
    assert(t.head.startsWith("caf") && t.head.endsWith(" page"))
  }

  test("truncated archive: the cut record yields one error row, prefix survives") {
    val full = warcRecord("warcinfo", "ok: 1\r\n".getBytes(UTF_8)) ++
      warcRecord("response",
        httpResponse("200 OK", Seq("Content-Type" -> "text/plain"),
          "partial payload here"),
        uri = "http://example.com/cut",
        contentType = "application/http; msgtype=response")
    // cut mid-body: the reader hits EOF before Content-Length bytes —
    // the documented contract owes the tail ONE error row (a partial
    // download must not vanish from a count-the-errors quality check)
    val df = WarcSource.read(spark, write("h.warc", full.dropRight(30)))
    assert(df.filter(col("error").isNull).count() === 1)
    val errs = df.filter(col("error").isNotNull).collect()
    assert(errs.length === 1)
    assert(errs.head.getAs[String]("error").contains("cut short"))
  }

  test("corrupt gzip header: one error row for the archive, not a task failure") {
    // valid magic bytes, then garbage: the GZIPInputStream CONSTRUCTOR
    // throws (unsupported compression method) before any record exists
    val junk = Array(0x1f.toByte, 0x8b.toByte) ++ Array.fill(64)(0x55.toByte)
    val df = WarcSource.read(spark, write("i.warc.gz", junk))
    assert(df.count() === 1)
    assert(df.head().getAs[String]("error").contains("unreadable archive"))
  }

  test("corrupt gzip member mid-archive: error row, parsed prefix survives") {
    def member(rec: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val gz = new GZIPOutputStream(out)
      gz.write(rec); gz.finish()
      out.toByteArray
    }
    val m1 = member(warcRecord("warcinfo", "ok: 1\r\n".getBytes(UTF_8)))
    val m2 = member(warcRecord("response",
      httpResponse("200 OK", Seq("Content-Type" -> "text/plain"), "body"),
      uri = "http://example.com/corrupt",
      contentType = "application/http; msgtype=response"))
    // zero a run of deflate bytes past member 2's 10-byte gzip header:
    // the inflater (or the record parser, if the bytes still inflate)
    // fails — either way the contract is an error row and a clean stop,
    // never an exception escaping the task (the recovery drain itself
    // reads the corrupt tail and must swallow what it hits)
    for (i <- 12 until 20) m2(i) = 0x00
    val df = WarcSource.read(spark, write("j.warc.gz", m1 ++ m2))
    assert(df.filter(col("error").isNull).count() === 1)
    assert(df.filter(col("error").isNotNull).count() >= 1)
  }

  test("streaming reader: micro-batched archives yield exactly the batch rows") {
    val dir = Files.createTempDirectory("graft_warcstream_")
    Files.write(dir.resolve("a.warc"), archive)
    Files.write(dir.resolve("b.warc.gz"),
      gzipMembers(warcRecord("warcinfo", "stream: 1\r\n".getBytes(UTF_8))))
    // a corrupt archive rides along: the error-row contract must hold
    // through the streaming path too
    Files.write(dir.resolve("c.warc.gz"),
      Array(0x1f.toByte, 0x8b.toByte) ++ Array.fill(32)(0x55.toByte))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = df
      .withColumn("body", decode(col("body"), "UTF-8"))
      .withColumn("archive",
        element_at(split(col("archive"), "/"), -1))
      .collect().toSeq.map(_.toString).sorted
    val batch = canon(WarcSource.read(spark, s"$dir/*.warc*"))
    val q = WarcSource.readStream(spark, dir.toString, maxFilesPerTrigger = 1)
      .writeStream.format("memory").queryName("warcmem")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = canon(spark.table("warcmem"))
    assert(streamed === batch && batch.nonEmpty)
    assert(spark.table("warcmem").filter(col("error").isNotNull).count() === 1)
    // and the curation projection composes on the stream the same way
    val q2 = WarcSource.readResponsesStream(spark, dir.toString)
      .writeStream.format("memory").queryName("warcmem2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    assert(spark.table("warcmem2").select("url").as[String].collect().toSeq
      === Seq("http://example.com/"))
  }

  test("readResponses: the curation-facing text projection") {
    val txt = WarcSource.readResponses(spark, write("e.warc", archive))
      .select("url", "text").as[(String, String)].collect().toSeq
    assert(txt === Seq(("http://example.com/", html)))
    // plugs straight into the text tier
    val stripped = WarcSource.readResponses(spark, write("f.warc", archive))
      .select(graft.functions.TextFunctions.stripHtml(col("text")).as("t"))
      .as[String].head()
    assert(stripped.trim === "hello crawl")
  }
}
