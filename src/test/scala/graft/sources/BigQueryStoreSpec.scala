package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec
import BigQueryStore._

/** Contract tests for the BigQuery warehouse adapter against the
  * recording client — dispositions, partitioning validation, streaming
  * insert buffering, and the NDJSON row transport. */
class BigQueryStoreSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("2024-01-01", "a", 1L), ("2024-01-02", "b", 2L))
    .toDF("date", "k", "v")

  test("write dispositions parse exactly the reference's allow-list") {
    assert(WriteDisposition.parse("WRITE_APPEND") === WriteAppend)
    assert(WriteDisposition.parse("WRITE_TRUNCATE") === WriteTruncate)
    assert(WriteDisposition.parse("append") === WriteAppend)
    assert(WriteDisposition.parse("truncate") === WriteTruncate)
    // mixed case is NOT in bigquery_queries.py:18's allow-list — the
    // membership check runs before the .lower() normalization, so
    // "Truncate"/"APPEND" are refused exactly like any other string
    for (bad <- Seq("replace", "Truncate", "APPEND", "Write_Append")) {
      val e = intercept[IllegalArgumentException] {
        WriteDisposition.parse(bad)
      }
      assert(e.getMessage.contains("Invalid write disposition"))
    }
  }

  test("time partitioning validates type and field like the reference") {
    assert(TimePartitioning("date", Some("day")).normalized === Some("DAY"))
    intercept[IllegalArgumentException] {
      TimePartitioning("date", Some("WEEK"))
    }
    intercept[IllegalArgumentException] { TimePartitioning("") }
    // the load refuses a partition field missing from the frame
    val wh = new BigQueryWarehouse(new RecordingBigQueryClient, "ds")
    intercept[IllegalArgumentException] {
      wh.load(df, "t", WriteAppend, Some(TimePartitioning("created")))
    }
  }

  test("append accumulates, truncate replaces; partitioning pins at create") {
    val client = new RecordingBigQueryClient
    val wh = new BigQueryWarehouse(client, "ds")
    wh.appendDayPartitioned(df, "gsc")
    wh.appendDayPartitioned(df.withColumn("v", col("v") + 10), "gsc")
    assert(client.tableRows("ds", "gsc").size === 4,
      "WRITE_APPEND accumulates across loads")
    assert(client.tablePartitioning("ds", "gsc") ===
      Some(TimePartitioning("date", Some("DAY"))),
      "the GSC shape: day partitioning on date")
    wh.load(df, "summary", WriteTruncate)
    wh.load(df, "summary", WriteTruncate)
    assert(client.tableRows("ds", "summary").size === 2,
      "WRITE_TRUNCATE replaces the table contents")
    // a later load with different partitioning refuses (server behavior)
    intercept[IllegalArgumentException] {
      wh.load(df, "gsc", WriteAppend, None)
    }
  }

  test("equivalent partitioning spellings are not drift") {
    val client = new RecordingBigQueryClient
    val wh = new BigQueryWarehouse(client, "ds")
    wh.load(df, "t", WriteAppend, Some(TimePartitioning("date", Some("DAY"))))
    // case-folded and defaulted (absent type ≡ DAY) spellings name the
    // SAME server-side configuration — refusing them as drift would
    // reject loads the real service accepts
    wh.load(df, "t", WriteAppend, Some(TimePartitioning("date", Some("day"))))
    wh.load(df, "t", WriteAppend, Some(TimePartitioning("date", None)))
    assert(client.tableRows("ds", "t").size === 6)
    // a different field (or granularity) is real drift
    intercept[IllegalArgumentException] {
      wh.load(df, "t", WriteAppend,
        Some(TimePartitioning("other", Some("DAY"))))
    }
    intercept[IllegalArgumentException] {
      wh.load(df, "t", WriteAppend,
        Some(TimePartitioning("date", Some("MONTH"))))
    }
  }

  test("rows travel as NDJSON with the frame's own field names") {
    val client = new RecordingBigQueryClient
    val wh = new BigQueryWarehouse(client, "ds")
    wh.load(df, "t", WriteAppend)
    val rows = client.tableRows("ds", "t")
    assert(rows.size === 2)
    assert(rows.forall(r => r.contains("\"date\":") && r.contains("\"k\":")
      && r.contains("\"v\":")), rows.mkString("\n"))
  }

  test("a frame above the staged threshold loads server-side: no row crosses the driver") {
    val client = new RecordingBigQueryClient
    val staging = java.nio.file.Files.createTempDirectory("bq_staging")
      .toString
    // threshold 1 byte: ANY frame routes staged — the point under test
    // is the routing + the transport, not the estimator's calibration
    val wh = new BigQueryWarehouse(client, "ds",
      stagingUri = Some(staging), stagedThresholdBytes = 1L)
    wh.appendDayPartitioned(df.repartition(3), "gsc")
    assert(client.loads.isEmpty,
      "no driver-iterator load may happen above the threshold")
    assert(client.uriLoads.size === 1)
    val ul = client.uriLoads.get(0)
    assert(ul.uris.nonEmpty &&
      ul.uris.forall(_.contains("part-")), ul.uris)
    assert(ul.disposition === WriteAppend)
    assert(ul.partitioning === Some(TimePartitioning("date", Some("DAY"))))
    // the server (mock) pulled the staged files itself: same rows, same
    // field names as the driver route would have shipped
    val rows = client.tableRows("ds", "gsc")
    assert(rows.size === 2)
    assert(rows.forall(r => r.contains("\"date\":") && r.contains("\"v\":")))
    // disposition semantics are route-independent: a truncate through
    // the staged path replaces like the driver path does
    wh.load(df, "summary", WriteTruncate)
    wh.load(df, "summary", WriteTruncate)
    assert(client.tableRows("ds", "summary").size === 2)
    // and partition drift is still refused across routes
    intercept[IllegalArgumentException] {
      wh.load(df, "gsc", WriteAppend, None)
    }
  }

  test("a zero-row frame routed staged falls back to the driver route") {
    val client = new RecordingBigQueryClient
    val staging = java.nio.file.Files.createTempDirectory("bq_staging")
      .toString
    val wh = new BigQueryWarehouse(client, "ds",
      stagingUri = Some(staging), stagedThresholdBytes = 1L)
    // the size ESTIMATE routes it staged, but zero rows survive the
    // filter → Spark writes no part files, and the real
    // load_table_from_uri rejects an empty sourceUris list — the
    // driver route completes the same load as a valid zero-row append
    wh.load(df.filter(col("v") > 999L), "t", WriteAppend)
    assert(client.uriLoads.isEmpty,
      "an empty sourceUris list must never reach the load job")
    assert(client.loads.size === 1)
    assert(client.tableRows("ds", "t").isEmpty)
  }

  test("a small frame (or no staging URI) keeps the reference's driver-stream route") {
    val client = new RecordingBigQueryClient
    val staging = java.nio.file.Files.createTempDirectory("bq_staging")
      .toString
    // generous threshold: the 2-row frame estimates far below it
    val wh = new BigQueryWarehouse(client, "ds",
      stagingUri = Some(staging), stagedThresholdBytes = 1L << 30)
    wh.load(df, "t", WriteAppend)
    assert(client.uriLoads.isEmpty && client.loads.size === 1)
    // no staging URI configured: staged routing can't engage at all,
    // and the explicit staged entry point refuses with a pointer
    val wh2 = new BigQueryWarehouse(client, "ds")
    wh2.load(df, "t2", WriteAppend)
    assert(client.uriLoads.isEmpty && client.loads.size === 2)
    intercept[IllegalStateException] {
      wh2.loadStaged(df, "t3", WriteAppend)
    }
  }

  test("streaming inserts buffer per table and drain on commit") {
    val client = new RecordingBigQueryClient
    val wh = new BigQueryWarehouse(client, "ds")
    wh.insertDataBatch("checks_a", Seq("""{"check":"title","valid":true}"""))
    wh.insertDataBatch("checks_a", Seq("""{"check":"desc","valid":false}"""))
    wh.insertDataBatch("checks_b", Seq("""{"check":"h1","valid":true}"""))
    assert(client.tableRows("ds", "checks_a").isEmpty,
      "nothing ships before commit (bigquery.py buffer semantics)")
    wh.commit()
    assert(client.tableRows("ds", "checks_a").size === 2)
    assert(client.tableRows("ds", "checks_b").size === 1)
    wh.commit() // a drained buffer commits nothing twice
    assert(client.tableRows("ds", "checks_a").size === 2)
  }

  test("staged formats: gzip default shrinks staged bytes, parquet " +
      "roundtrips, format recorded on the load job") {
    def stagedBytes(uris: Seq[String]): Long = uris.map(u =>
      new java.io.File(java.net.URI.create(u).getPath).length).sum
    // a repetitive frame so gzip has something to compress
    val wide = spark.range(2000).select(
      col("id"),
      concat(lit("2024-01-"), lpad((col("id") % 28 + 1).cast("string"),
        2, "0")).as("date"),
      lit("the same value every row ").as("k"),
      (col("id") % 7).as("v"))
    def loadWith(fmt: StagedFormat): RecordingBigQueryClient = {
      val client = new RecordingBigQueryClient
      val staging = java.nio.file.Files
        .createTempDirectory("bq_fmt").toString
      val wh = new BigQueryWarehouse(client, "ds",
        stagingUri = Some(staging), stagedThresholdBytes = 1L,
        stagedFormat = fmt)
      wh.load(wide, "t", WriteAppend)
      assert(client.loads.isEmpty, "must take the staged route")
      assert(client.uriLoads.size === 1)
      client
    }
    val cPlain = loadWith(StagedFormat.Ndjson)
    val cGzip = loadWith(StagedFormat.GzipNdjson)
    val cParq = loadWith(StagedFormat.Parquet)
    assert(cPlain.uriLoads.get(0).format === StagedFormat.Ndjson &&
      cGzip.uriLoads.get(0).format === StagedFormat.GzipNdjson &&
      cParq.uriLoads.get(0).format === StagedFormat.Parquet,
      "the load job must record the staged wire format")
    // the mock server decoded every format to the same 2000 rows
    assert(cPlain.tableRows("ds", "t").size === 2000)
    assert(cGzip.tableRows("ds", "t").size === 2000)
    assert(cParq.tableRows("ds", "t").size === 2000)
    // gzip is the default because it shrinks the staged bytes hard
    val (bPlain, bGzip, bParq) = (
      stagedBytes(cPlain.uriLoads.get(0).uris),
      stagedBytes(cGzip.uriLoads.get(0).uris),
      stagedBytes(cParq.uriLoads.get(0).uris))
    assert(bGzip * 4 < bPlain,
      s"gzip staged bytes $bGzip must be <1/4 of plain $bPlain")
    assert(bParq < bPlain, s"parquet $bParq must beat plain $bPlain")
    // parquet rows re-render with the frame's field names and values
    val row = cParq.tableRows("ds", "t").head
    assert(row.contains("\"date\":\"2024-01-") &&
      row.contains("\"k\":\"the same value every row \"") &&
      row.contains("\"v\":"), row)
    // disposition semantics are format-independent
    val cT = loadWith(StagedFormat.Parquet)
    // (loadWith used WriteAppend; a second truncate load replaces)
    val whT = new BigQueryWarehouse(cT, "ds",
      stagingUri = Some(java.nio.file.Files
        .createTempDirectory("bq_fmt").toString),
      stagedThresholdBytes = 1L, stagedFormat = StagedFormat.Parquet)
    whT.load(wide, "t", WriteTruncate)
    assert(cT.tableRows("ds", "t").size === 2000)
  }

  test("parameterized queries pass through the client boundary") {
    val client = new RecordingBigQueryClient
    client.queryResult = Seq("""{"n":3}""")
    val wh = new BigQueryWarehouse(client, "ds")
    val out = wh.query("SELECT COUNT(*) AS n FROM ds.t WHERE d = @day",
      Map("day" -> "2024-01-01"))
    assert(out === Seq("""{"n":3}"""))
    assert(client.queries.get(0) ===
      ("SELECT COUNT(*) AS n FROM ds.t WHERE d = @day",
        Map("day" -> "2024-01-01")))
  }
}
