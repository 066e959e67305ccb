package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raw web-crawl ingestion: WARC (ISO 28500) archives — the format
  * CommonCrawl and every Heritrix-style crawler emit — parsed into a
  * DataFrame a curation pipeline can consume directly. This is the
  * entry point for "point the engine at a crawl dump": WARC →
  * [[readResponses]] → strip_html / language-ID / quality →
  * [[graft.operators.Pipeline.curate]].
  *
  * Scale shape: one task per archive file via
  * `sparkContext.binaryFiles` + a STREAMING record iterator — a 1 GB
  * archive is never materialized whole; records decode off a bounded
  * buffer and each body is capped at `maxBodyBytes` (oversize bodies
  * truncate, flagged, never buffered past the cap). A CommonCrawl
  * segment keeps ~64k archives per crawl, so file-granular parallelism
  * saturates any executor count; per-record work is row-local. Gzip
  * archives (the on-disk norm: each record its own gzip member) are
  * detected by magic bytes and read through one multi-member
  * `GZIPInputStream`.
  *
  * Error semantics follow the library's source idiom (error ROWS, never
  * throws — html_parser's RequestException shape): a malformed record
  * yields a row with `error` set and the rest null, and parsing resumes
  * at the next record boundary where possible; a stream whose remainder
  * is unreadable yields one final error row for the file tail. */
object WarcSource {

  val schema: StructType = StructType(Seq(
    StructField("archive", StringType),        // source file path
    StructField("record_offset", LongType),    // records seen before this one
    StructField("warc_type", StringType),      // response/request/warcinfo/...
    StructField("url", StringType),            // WARC-Target-URI
    StructField("warc_date", StringType),      // WARC-Date, verbatim ISO-8601
    StructField("record_id", StringType),      // WARC-Record-ID
    StructField("http_status", IntegerType),   // response records only
    StructField("content_type", StringType),   // payload type (HTTP header)
    StructField("headers", MapType(StringType, StringType)), // HTTP headers
    StructField("body", BinaryType),           // payload bytes (capped)
    StructField("truncated", BooleanType),     // body hit maxBodyBytes
    StructField("error", StringType)))         // parse failure, else null

  /** One parsed WARC record (or a parse-failure marker). */
  private[sources] final case class Rec(
      warcType: String, url: String, date: String, recordId: String,
      httpStatus: Option[Int], contentType: String,
      headers: Map[String, String], body: Array[Byte], truncated: Boolean,
      error: String)

  /** Every record of every archive under `path` (glob ok). */
  def read(spark: SparkSession, path: String,
           maxBodyBytes: Int = 1 << 20,
           minPartitions: Int = 32): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(path, minPartitions)
      .flatMap { case (file, pds) =>
        archiveRows(file, () => pds.open(), maxBodyBytes)
      }
    spark.createDataFrame(rows, schema)
  }

  /** STREAMING form of [[read]]: a `binaryFile`-source stream over a
    * growing archive directory — each newly landed `.warc`/`.warc.gz`
    * becomes one micro-batch slice of parsed records, parsed by the
    * SAME iterator as the batch path (identical rows, identical error
    * semantics; pinned by WarcSourceSpec). This is the continuous
    * "crawler drops archives, curation keeps up" entry point — compose
    * with [[graft.streaming.Streaming.curationSink]] after assigning
    * the store's monotone ids (the sink's documented id contract; an
    * ingest-time sequence source satisfies it by construction).
    *
    * Memory shape: the stream rides the binaryFile source for its file
    * DISCOVERY and exactly-once file tracking only — the `content`
    * column is pruned away (the source's documented behavior: an
    * unrequired content field is never read), so each micro-batch
    * carries file REFERENCES, and the executors open a Hadoop stream
    * per archive inside the flatMap, exactly like the batch path. A
    * 1 GB CommonCrawl WARC never materializes whole; per-task memory
    * is one decode buffer plus `maxBodyBytes`. */
  def readStream(spark: SparkSession, dir: String,
                 maxBodyBytes: Int = 1 << 20,
                 maxFilesPerTrigger: Int = 16): DataFrame = {
    import org.apache.spark.sql.Encoders
    // the binaryFile source's fixed schema, spelled out because a
    // STREAMING source refuses schema inference
    val binaryFileSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    val src = spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.warc*")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)
    // Hadoop Configuration is not serializable; ship it the standard way
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    src.select(col("path")) // content pruned: the scan reads NO bytes
      .as[String](Encoders.STRING)
      .flatMap { file =>
        val p = new org.apache.hadoop.fs.Path(file)
        archiveRows(file,
          () => p.getFileSystem(confBc.value.value).open(p), maxBodyBytes)
      }(Encoders.row(schema))
  }

  /** [[readResponses]]' streaming twin over [[readStream]]. */
  def readResponsesStream(spark: SparkSession, dir: String,
                          maxBodyBytes: Int = 1 << 20,
                          maxFilesPerTrigger: Int = 16): DataFrame =
    responsesProjection(readStream(spark, dir, maxBodyBytes,
      maxFilesPerTrigger))

  /** One archive's parsed rows — shared verbatim by the batch RDD path
    * and the streaming flatMap, so the two sources can never drift.
    * Stream construction is part of the never-throws contract too: a
    * file whose first bytes say gzip but whose header is
    * truncated/corrupt makes the GZIPInputStream CONSTRUCTOR throw —
    * that must be one error row for the archive, not a task failure
    * that kills the ingest deterministically across retries. */
  private def archiveRows(file: String, open: () => InputStream,
                          maxBodyBytes: Int): Iterator[Row] = {
    val recs: Iterator[Rec] = {
      var raw: BufferedInputStream = null
      try {
        raw = new BufferedInputStream(open(), 1 << 16)
        val in =
          if (isGzip(raw)) new GZIPInputStream(raw, 1 << 16) else raw
        // the iterator's finish() is the early-close fast path, but a
        // PARTIALLY consumed iterator (df.limit(n), take(), a downstream
        // task failure) never drains it — close at task completion too,
        // or the gzip handle leaks for the life of the executor
        val handle = in
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            try handle.close() catch { case _: Exception => () }
          })
        records(in, maxBodyBytes)
      } catch {
        case e: Exception =>
          if (raw != null) try raw.close() catch { case _: Exception => () }
          Iterator.single(errRec(
            s"unreadable archive: ${e.getClass.getSimpleName}"))
      }
    }
    var off = -1L
    recs.map { r =>
      off += 1
      Row(file, off, r.warcType, r.url, r.date, r.recordId,
        r.httpStatus.map(Int.box).orNull, r.contentType, r.headers,
        r.body, r.truncated, r.error)
    }
  }

  /** The curation-facing projection: HTTP `response` records only, body
    * decoded to text (UTF-8, lossy: undecodable bytes become U+FFFD) —
    * (url, warc_date, http_status, content_type, text, truncated).
    *
    * The decode is a deliberate UDF, not `functions.decode`: Spark 4's
    * StringDecode THROWS MALFORMED_CHARACTER_CODING on invalid bytes,
    * and a crawl corpus GUARANTEES invalid bytes (mislabeled latin-1,
    * binary sniffed as text) — one bad page must not kill a 100 TB
    * ingest. `new String(bytes, UTF_8)` replaces instead (pinned in
    * WarcSourceSpec); the per-row JVM cost is the same class of work
    * StringDecode does anyway. */
  def readResponses(spark: SparkSession, path: String,
                    maxBodyBytes: Int = 1 << 20): DataFrame =
    responsesProjection(read(spark, path, maxBodyBytes))

  private def responsesProjection(records: DataFrame): DataFrame = {
    val lossyUtf8 = udf((b: Array[Byte]) =>
      if (b == null) null
      else new String(b, java.nio.charset.StandardCharsets.UTF_8))
    records
      .filter(col("error").isNull && col("warc_type") === "response")
      .select(col("url"), col("warc_date"), col("http_status"),
        col("content_type"),
        lossyUtf8(col("body")).as("text"), col("truncated"))
  }

  /** Gzip magic sniff on a mark-supporting stream. */
  private def isGzip(in: BufferedInputStream): Boolean = {
    in.mark(2)
    val b0 = in.read(); val b1 = in.read()
    in.reset()
    b0 == 0x1f && b1 == 0x8b
  }

  // ------------------------------------------------------ record parser

  /** Streaming iterator over the records of one archive stream. Never
    * throws: malformed content becomes an error record; the iterator
    * ends at EOF. The stream is read strictly forward with no
    * lookahead past the current record. */
  private[sources] def records(in: InputStream,
                               maxBodyBytes: Int): Iterator[Rec] =
    new Iterator[Rec] {
      private var nextRec: Rec = _
      private var done = false
      // set when the CURRENT nextRec is a tail error: the stream past it
      // is untrusted (lost framing / truncation / codec corruption), so
      // the iterator must end after yielding it. Terminating by flag —
      // not by draining to EOF and re-reading — is load-bearing: a
      // corrupt gzip stream THROWS on every subsequent read instead of
      // returning -1, and a drain-then-retry loop would emit an
      // "unreadable record" error row forever (observed live: count()
      // never returning on a bit-flipped member).
      private var tailError = false
      advance()

      override def hasNext: Boolean = !done
      override def next(): Rec = {
        val r = nextRec
        if (tailError) finish() else advance()
        r
      }

      private def advance(): Unit =
        try {
          // skip inter-record CRLFs (the spec's two-newline separator —
          // lenient about how many actually appear)
          var line = readLine(in)
          while (line != null && line.isEmpty) line = readLine(in)
          if (line == null) { finish(); return }
          if (!line.startsWith("WARC/")) {
            // lost framing: without a trusted Content-Length there is no
            // next boundary — emit one tail error and stop
            tailErr(errRec(s"expected WARC/ version line, got '${
              line.take(40)}'"))
            return
          }
          val hdrs = readHeaders(in)
          val len = hdrs.get("content-length").flatMap(_.toLongOption)
          if (len.isEmpty) {
            tailErr(errRec("record missing Content-Length"))
            return
          }
          val (body, truncated) = readBody(in, len.get, maxBodyBytes)
          val warcType = hdrs.getOrElse("warc-type", "")
          val base = Rec(warcType, hdrs.getOrElse("warc-target-uri", null),
            hdrs.getOrElse("warc-date", null),
            hdrs.getOrElse("warc-record-id", null), None,
            hdrs.getOrElse("content-type", null), Map.empty, body,
            truncated, null)
          nextRec =
            if (warcType == "response" &&
                base.contentType != null &&
                base.contentType.startsWith("application/http"))
              parseHttp(base)
            else base
        } catch {
          case _: EOFException =>
            // thrown only mid-record (readLine signals clean EOF with
            // null) — a body cut short by a truncated archive. The
            // documented contract owes the tail ONE error row, not a
            // silent disappearance.
            tailErr(errRec("record body cut short (truncated archive)"))
          case e: Exception =>
            tailErr(errRec(
              s"unreadable record: ${e.getClass.getSimpleName}"))
        }

      private def tailErr(r: Rec): Unit = { nextRec = r; tailError = true }

      /** End of stream: release the (possibly gzip-wrapping) handle —
        * flatMap iterators are never auto-closed by the scheduler. */
      private def finish(): Unit = {
        done = true
        try in.close() catch { case _: Exception => () }
      }

    }

  /** A parse-failure marker row (all fields null but `error`). */
  private def errRec(msg: String): Rec =
    Rec(null, null, null, null, None, null, Map.empty,
      Array.emptyByteArray, truncated = false, error = msg)

  /** Split a response record's HTTP envelope off its payload: status
    * line + headers parsed, `body` replaced by the payload bytes. A
    * malformed envelope keeps the raw body and reports the error (the
    * record is still a record — the archive said so). */
  private def parseHttp(r: Rec): Rec = {
    val sep = indexOfDoubleCrlf(r.body)
    if (sep < 0)
      return r.copy(error = "http response without header terminator")
    val head = new String(r.body, 0, sep, java.nio.charset.StandardCharsets.ISO_8859_1)
    val lines = head.split("\r\n")
    val status = lines.headOption
      .filter(_.startsWith("HTTP/"))
      .flatMap(_.split(" ", 3).lift(1)).flatMap(_.toIntOption)
    if (status.isEmpty)
      return r.copy(error = s"bad http status line '${
        lines.headOption.getOrElse("").take(40)}'")
    val headers = lines.drop(1).iterator.flatMap { l =>
      val i = l.indexOf(':')
      if (i <= 0) None
      else Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
    }.toMap
    r.copy(httpStatus = status,
      contentType = headers.getOrElse("content-type", r.contentType),
      headers = headers,
      body = java.util.Arrays.copyOfRange(r.body, sep + 4, r.body.length))
  }

  private def indexOfDoubleCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
          b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** CRLF (or bare LF, lenient) terminated line as ISO-8859-1; null at
    * EOF with nothing read. */
  private def readLine(in: InputStream): String = {
    val sb = new java.lang.StringBuilder(64)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    sb.toString
  }

  /** WARC header block (terminated by a blank line), keys lowercased. */
  private def readHeaders(in: InputStream): Map[String, String] = {
    val m = Map.newBuilder[String, String]
    var line = readLine(in)
    while (line != null && line.nonEmpty) {
      val i = line.indexOf(':')
      if (i > 0)
        m += line.substring(0, i).trim.toLowerCase -> line.substring(i + 1).trim
      line = readLine(in)
    }
    m.result()
  }

  /** Exactly `len` content bytes: the first `maxBodyBytes` kept, the
    * rest consumed and dropped (the stream must stay positioned at the
    * record boundary either way). */
  private def readBody(in: InputStream, len: Long,
                       maxBodyBytes: Int): (Array[Byte], Boolean) = {
    val keep = math.min(len, maxBodyBytes.toLong).toInt
    val buf = new Array[Byte](keep)
    var read = 0
    while (read < keep) {
      val n = in.read(buf, read, keep - read)
      if (n < 0) throw new EOFException("record body cut short")
      read += n
    }
    var toSkip = len - keep
    while (toSkip > 0) {
      val n = in.skip(toSkip)
      if (n <= 0) {
        if (in.read() < 0) throw new EOFException("record body cut short")
        toSkip -= 1
      } else toSkip -= n
    }
    (buf, len > keep)
  }
}
