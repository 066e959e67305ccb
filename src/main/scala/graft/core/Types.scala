package graft.core

import java.sql.Timestamp
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core record types of the engine (SURVEY §1.1).
  *
  * Reference shapes:
  *  - URL struct: /root/reference/utilities/url.py:4-17 (protocol, domain,
  *    path, query) — also the nested RECORD column of
  *    database/bigquery.py:192-197.
  *  - Check row: database/bigquery.py:183-199 and
  *    database/orm/tables/__init__.py:46-58.
  *  - Alert: service/alerting/alert.py (queue docs of
  *    service/alerting/queue.py:30-62).
  */
final case class Url(protocol: String, domain: String, path: String, query: String) {
  def render: String = {
    val q = if (query == null || query.isEmpty) "" else s"?$query"
    s"$protocol://$domain$path$q"
  }
}

object Url {
  val schema: StructType = StructType(Seq(
    StructField("protocol", StringType),
    StructField("domain", StringType),
    StructField("path", StringType),
    StructField("query", StringType)))

  /** Column-level URL parser: string url → struct(protocol, domain, path,
    * query) via Spark's codegen'd `parse_url` — no UDF in the hot path. */
  def parse(url: Column): Column = struct(
    lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)).as("protocol"),
    parse_url(url, lit("HOST")).as("domain"),
    coalesce(parse_url(url, lit("PATH")), lit("")).as("path"),
    coalesce(parse_url(url, lit("QUERY")), lit("")).as("query"))

  /** Inverse of [[parse]] as a Column program. */
  def render(u: Column): Column = concat(
    u.getField("protocol"), lit("://"), u.getField("domain"), u.getField("path"),
    when(length(u.getField("query")) > 0, concat(lit("?"), u.getField("query")))
      .otherwise(lit("")))
}

/** One assertion result — the reference's unit of monitoring output. */
final case class Check(
    created: Timestamp,
    check: String,
    value: String,
    valid: Boolean,
    diff: String,
    error: String,
    url: Url)

object Check {
  val schema: StructType = StructType(Seq(
    StructField("created", TimestampType),
    StructField("check", StringType),
    StructField("value", StringType),
    StructField("valid", BooleanType),
    StructField("diff", StringType),
    StructField("error", StringType),
    StructField("url", Url.schema)))
}

/** Queued alert (reference: mongo alert queue, delete-on-read). */
final case class Alert(
    created: Timestamp,
    group: String,
    subject: String,
    body: String,
    payload: String)
