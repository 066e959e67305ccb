package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.CheckDsl
import graft.operators.QueryHelper
import graft.sources.QueueStore

/** S10 alerting_check + S11 alerting_dispatcher (SURVEY §2.1).
  *
  * alerting_check (/root/reference/modules/aggregation/custom/
  * alerting_check.py:158-236): run a query; then either
  *  - per-row mode: evaluate each `checksPerLine` comparison template per
  *    row — failing rows (or passing, under negate) produce one Alert per
  *    configured group, and every evaluation produces a log row;
  *  - whole-result mode: rowcount>0 (or ==0 under negate) produces one
  *    Alert per group with a {results, resultsCount} payload.
  *
  * alerting_dispatcher (alerting_dispatcher.py:29-273): drain the queue
  * for configured groups (delete-on-read, service/alerting/queue.py:45-62),
  * render, send via a Notifier; failures re-enqueue the alerts.
  */
object Alerting {

  val alertSchema: StructType = StructType(Seq(
    StructField("created", TimestampType),
    StructField("group", StringType),
    StructField("message", StringType),
    StructField("payload", StringType)))

  val logSchema: StructType = StructType(Seq(
    StructField("date", TimestampType),
    StructField("name", StringType),
    StructField("message", StringType),
    StructField("success", BooleanType)))

  final case class CheckConfig(
      query: String,
      parameters: Map[String, Any] = Map.empty,
      groups: Seq[String] = Seq("default"),
      message: String = "alert",
      negate: Boolean = false,
      checksPerLine: Seq[String] = Nil,
      logName: Option[String] = None,
      logMessage: String = "")

  /** Result of one alerting check run, as DataFrames the caller writes
    * (alerts → queue, logs → log table). */
  final case class CheckOutput(alerts: DataFrame, logs: DataFrame)

  def runCheck(spark: SparkSession, cfg: CheckConfig,
               now: java.sql.Timestamp): CheckOutput = {
    val result = QueryHelper.runQuery(spark, cfg.query, cfg.parameters)
    if (cfg.checksPerLine.nonEmpty) perRow(spark, cfg, result, now)
    else wholeResult(spark, cfg, result, now)
  }

  /** Per-row mode (alerting_check.py:171-196): the comparison DSL compiles
    * once per check template; alerts fire where (check == negate) — i.e.
    * failing checks normally, passing checks under negate. */
  private def perRow(spark: SparkSession, cfg: CheckConfig, result: DataFrame,
                     now: java.sql.Timestamp): CheckOutput = {
    val columns = result.columns.toSet
    val perCheck = cfg.checksPerLine.map { template =>
      val ok = CheckDsl.compile(template)
      val evaluated = result.withColumn("__ok", coalesce(ok, lit(false)))
      val logs = cfg.logName.map { name =>
        evaluated.select(
          lit(now).as("date"), lit(name).as("name"),
          QueryHelper.renderTemplate(cfg.logMessage, columns).as("message"),
          col("__ok").as("success"))
      }
      val firing = evaluated.filter(col("__ok") === lit(cfg.negate))
      val payload = to_json(struct(result.columns.map(col).toIndexedSeq: _*))
      val alerts = cfg.groups.map { g =>
        firing.select(
          lit(now).as("created"), lit(g).as("group"),
          QueryHelper.renderTemplate(cfg.message, columns).as("message"),
          payload.as("payload"))
      }.reduce(_.unionByName(_))
      (alerts, logs)
    }
    val alerts = perCheck.map(_._1).reduce(_.unionByName(_))
    val logs = perCheck.flatMap(_._2) match {
      case Nil => emptyLogs(spark)
      case ls => ls.reduce(_.unionByName(_))
    }
    // reference: empty result + per-line mode logs one success row
    val logsWithEmpty = cfg.logName match {
      case Some(name) if result.isEmpty =>
        import spark.implicits._
        logs.unionByName(Seq((now, name, "", true))
          .toDF("date", "name", "message", "success"))
      case _ => logs
    }
    CheckOutput(alerts, logsWithEmpty)
  }

  /** Whole-result mode (alerting_check.py:197-231). */
  private def wholeResult(spark: SparkSession, cfg: CheckConfig,
                          result: DataFrame, now: java.sql.Timestamp): CheckOutput = {
    import spark.implicits._
    val rows = result.limit(1001).collect()  // payload cap; count from agg
    val n = if (rows.length > 1000) result.count() else rows.length.toLong
    val fires = (n > 0 && !cfg.negate) || (n == 0 && cfg.negate)
    val message = cfg.message
      .replace("{resultsCount}", n.toString)
      .replace("{results}", if (rows.length <= 50) rows.mkString("; ") else s"<$n rows>")
    val alerts =
      if (!fires) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], alertSchema)
      else cfg.groups.map(g => (now, g, message, s"""{"resultsCount": $n}"""))
        .toDF("created", "group", "message", "payload")
    val logs = cfg.logName match {
      case Some(name) =>
        val logMsg = cfg.logMessage
          .replace("{resultsCount}", n.toString)
          .replace("{results}", if (rows.length <= 50) rows.mkString("; ") else s"<$n rows>")
        Seq((now, name, logMsg, !fires)).toDF("date", "name", "message", "success")
      case None => emptyLogs(spark)
    }
    CheckOutput(alerts, logs)
  }

  private def emptyLogs(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], logSchema)

  // ------------------------------------------------------------ dispatch

  /** Notification boundary (SMTP / Wrike in the reference, behind a trait
    * so tests never touch the network — SURVEY §7.4). */
  trait Notifier extends Serializable {
    /** Send one batch for one group; throw to signal failure. */
    def send(group: String, alerts: Seq[(java.sql.Timestamp, String, String)]): Unit
  }

  final class RecordingNotifier extends Notifier {
    val sent = scala.collection.mutable.ArrayBuffer
      .empty[(String, Seq[(java.sql.Timestamp, String, String)])]
    override def send(group: String,
                      alerts: Seq[(java.sql.Timestamp, String, String)]): Unit =
      sent += (group -> alerts)
  }

  final class FailingNotifier extends Notifier {
    override def send(group: String,
                      alerts: Seq[(java.sql.Timestamp, String, String)]): Unit =
      throw new RuntimeException("smtp down")
  }

  /** Drain the alert queue and dispatch per group; failed groups are
    * re-enqueued (alerting_dispatcher.py:177-179). Alert batches are
    * small by construction (human-facing), so the driver-side collect is
    * the correct shape — same as the reference. */
  def dispatch(spark: SparkSession, queues: QueueStore, queue: String,
               groups: Seq[String], notifier: Notifier): Unit = {
    val drained = queues.drain(queue, alertSchema)
    val byGroup = drained.groupBy(_.getString(1))
    val failed = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    groups.foreach { g =>
      val rows = byGroup.getOrElse(g, Seq.empty)
      if (rows.nonEmpty) {
        try notifier.send(g, rows.map(r =>
          (r.getTimestamp(0), r.getString(2), r.getString(3))))
        catch { case _: Exception => failed ++= rows }
      }
    }
    // anything for groups we don't handle stays queued too
    val unhandled = byGroup.filterNot { case (g, _) => groups.contains(g) }
      .values.flatten
    val back = failed.toSeq ++ unhandled
    if (back.nonEmpty)
      queues.enqueue(queue, spark.createDataFrame(
        spark.sparkContext.parallelize(back), alertSchema))
  }
}
