package graft.sources

import org.apache.spark.sql.DataFrame

/** Production BigQuery warehouse adapter — the Spark-side counterpart
  * of the reference's main sink (`database/bigquery.py`), behind a
  * MOCKABLE transport boundary so every disposition/partitioning
  * semantic is contract-testable without egress (the WrikeClient /
  * Renderer discipline).
  *
  * Surface reproduced:
  *  - load jobs with WRITE_APPEND / WRITE_TRUNCATE dispositions and
  *    optional time partitioning (HOUR/DAY/MONTH/YEAR on a named
  *    field), validated exactly like the reference's allow-lists
  *    (bigquery_queries.py:18-24, 90-117) — an invalid disposition or
  *    partition type fails fast at CONFIG time;
  *  - the GSC day-partitioned append (google_search_console.py:388-391:
  *    WRITE_APPEND + TimePartitioning(DAY, field=date)) as
  *    [[BigQueryWarehouse.appendDayPartitioned]];
  *  - buffered streaming inserts + commit for the checks tables
  *    (bigquery.py:201-209 `_insert_data_batch`/`commit` via
  *    `insert_rows`);
  *  - parameterized query jobs (bigquery.py:243-262).
  *
  * Row transport is newline-delimited JSON — the BigQuery REST load
  * format — produced by Spark's own `toJSON` and STREAMED through
  * `toLocalIterator`, so driver memory holds one partition at a time.
  * That matches the reference's scale envelope exactly (it loads a
  * driver-held pandas frame); at true warehouse scale the production
  * route is parquet-to-GCS + a load-job URI, which this boundary admits
  * (a client impl can spill the iterator to GCS and reference it)
  * without changing any caller.
  */
object BigQueryStore {

  /** bigquery_queries.py:18 ALLOWED_WRITE_DISPOSITION, with the same
    * lax spellings accepted and everything else refused. */
  sealed abstract class WriteDisposition(val wire: String)
  case object WriteAppend extends WriteDisposition("WRITE_APPEND")
  case object WriteTruncate extends WriteDisposition("WRITE_TRUNCATE")

  object WriteDisposition {
    def parse(s: String): WriteDisposition = s match {
      // exact allow-list membership first (bigquery_queries.py:92) —
      // mixed case ("Append", "TRUNCATE") is REFUSED like the reference
      case "WRITE_APPEND" | "append"   => WriteAppend
      case "WRITE_TRUNCATE" | "truncate" => WriteTruncate
      case other => throw new IllegalArgumentException(
        s"""Invalid write disposition type "$other"""") // bigquery_queries.py:93
    }
  }

  /** bigquery_queries.py:19-24 ALLOWED_TIME_PARTITION_TYPE; the type is
    * optional in the reference (None → BigQuery's default DAY). */
  final case class TimePartitioning(field: String,
                                    ptype: Option[String] = None) {
    require(field.nonEmpty, "missing field for time partitioning")
    private val allowed = Set("HOUR", "DAY", "MONTH", "YEAR")
    val normalized: Option[String] = ptype.map(_.toUpperCase)
    /** Server-semantic identity: case-folded type, absent type ≡ the
      * server's default DAY — what a drift check must compare (the raw
      * case-class equality would refuse `Some("day")` vs `Some("DAY")`
      * or `None` vs `Some("DAY")`, all the same table server-side). */
    def canonical: (String, String) = (field, normalized.getOrElse("DAY"))
    normalized.foreach(t => require(allowed.contains(t),
      s"""Invalid time partitioning type "$t""""))
  }

  /** The transport boundary — everything a real deployment wires to the
    * BigQuery REST API (or the GCS-staged load path), everything a test
    * drives with [[RecordingBigQueryClient]]. Rows are NDJSON lines. */
  trait BigQueryClient {
    def hasTable(dataset: String, table: String): Boolean
    /** One load job: create-if-needed with `partitioning`, then load
      * `rows` under `disposition`. MUST consume the iterator lazily. */
    def load(dataset: String, table: String, rows: Iterator[String],
             disposition: WriteDisposition,
             partitioning: Option[TimePartitioning]): Unit
    /** Streaming `insert_rows` — the checks-table path. */
    def insertRows(dataset: String, table: String,
                   rows: Seq[String]): Unit
    /** Parameterized query job; named `@param` scalars; NDJSON rows
      * back. */
    def query(sql: String, params: Map[String, String]): Seq[String]
  }

  /** In-memory client for contract tests and locked-down smoke runs:
    * records every load/insert/query with its configuration and keeps
    * per-table row state so disposition semantics are observable
    * (truncate replaces, append accumulates, partitioning pins at
    * create and refuses drift — the server's own behavior). */
  final class RecordingBigQueryClient extends BigQueryClient {
    final case class Load(dataset: String, table: String, rowCount: Int,
                          disposition: WriteDisposition,
                          partitioning: Option[TimePartitioning])
    val loads = new java.util.concurrent.CopyOnWriteArrayList[Load]()
    val queries = new java.util.concurrent.CopyOnWriteArrayList[(String, Map[String, String])]()
    private val state = new java.util.concurrent.ConcurrentHashMap[String, Vector[String]]()
    private val parts = new java.util.concurrent.ConcurrentHashMap[String, Option[TimePartitioning]]()
    @volatile var queryResult: Seq[String] = Nil

    private def key(d: String, t: String) = s"$d.$t"

    override def hasTable(dataset: String, table: String): Boolean =
      state.containsKey(key(dataset, table))

    override def load(dataset: String, table: String,
                      rows: Iterator[String],
                      disposition: WriteDisposition,
                      partitioning: Option[TimePartitioning]): Unit = {
      val k = key(dataset, table)
      val existing = Option(parts.get(k))
      // drift compares CANONICAL partitioning (case-folded, None ≡ DAY)
      // — the server's identity, not the case-class literal
      existing.foreach(p => require(
        p.map(_.canonical) == partitioning.map(_.canonical),
        s"table $k exists with partitioning $p, load requested $partitioning"))
      parts.put(k, partitioning)
      val materialized = rows.toVector
      state.compute(k, (_, prev) => disposition match {
        case WriteTruncate => materialized
        case WriteAppend => Option(prev).getOrElse(Vector.empty) ++ materialized
      })
      loads.add(Load(dataset, table, materialized.size, disposition,
        partitioning))
      ()
    }

    override def insertRows(dataset: String, table: String,
                            rows: Seq[String]): Unit = {
      val k = key(dataset, table)
      parts.putIfAbsent(k, None)
      state.compute(k, (_, prev) =>
        Option(prev).getOrElse(Vector.empty) ++ rows)
      ()
    }

    override def query(sql: String,
                       params: Map[String, String]): Seq[String] = {
      queries.add((sql, params))
      queryResult
    }

    def tableRows(dataset: String, table: String): Seq[String] =
      Option(state.get(key(dataset, table))).getOrElse(Vector.empty)
    def tablePartitioning(dataset: String,
                          table: String): Option[TimePartitioning] =
      Option(parts.get(key(dataset, table))).flatten
  }
}

/** The warehouse-facing adapter: DataFrames in, reference-shaped
  * BigQuery operations out. One instance per (project, dataset) — the
  * reference's `BigQuery` object scope (bigquery.py:41-78). */
final class BigQueryWarehouse(client: BigQueryStore.BigQueryClient,
                              dataset: String) {
  import BigQueryStore._

  /** The reference's streaming-insert buffer (bigquery.py:201-209):
    * rows accumulate per table and ship on [[commit]] via
    * `insert_rows`. */
  private val insertBatch =
    scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]

  def hasTable(table: String): Boolean = client.hasTable(dataset, table)

  /** Load a DataFrame under an explicit disposition/partitioning — the
    * bigquery_queries result sink (bigquery_queries.py:208-231). The
    * frame streams as NDJSON one partition at a time. */
  def load(df: DataFrame, table: String, disposition: WriteDisposition,
           partitioning: Option[TimePartitioning] = None): Unit = {
    partitioning.foreach(p => require(df.columns.contains(p.field),
      s"time partitioning field '${p.field}' not in DataFrame columns " +
        df.columns.mkString("[", ", ", "]")))
    import scala.jdk.CollectionConverters._
    client.load(dataset, table, df.toJSON.toLocalIterator().asScala,
      disposition, partitioning)
  }

  /** The GSC sink shape: WRITE_APPEND + day partitioning on `date`
    * (google_search_console.py:388-391). */
  def appendDayPartitioned(df: DataFrame, table: String,
                           dateField: String = "date"): Unit =
    load(df, table, WriteAppend,
      Some(TimePartitioning(dateField, Some("DAY"))))

  /** Buffer rows for a streaming insert (bigquery.py:201-206). */
  def insertDataBatch(table: String, jsonRows: Seq[String]): Unit =
    insertBatch.updateWith(table)(prev =>
      Some(prev.getOrElse(Vector.empty) ++ jsonRows))

  /** Ship every buffered batch via `insert_rows` (bigquery.py:207-209).
    * The buffer drains only on success per table — a failed table's
    * rows stay buffered for a retry, matching the reference's
    * exception propagation out of `commit`. */
  def commit(): Unit =
    insertBatch.keys.toSeq.foreach { t =>
      client.insertRows(dataset, t, insertBatch(t))
      insertBatch.remove(t)
    }

  /** Parameterized query (bigquery.py:243-262): named scalar params. */
  def query(sql: String, params: Map[String, String] = Map.empty)
      : Seq[String] = client.query(sql, params)
}
