package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.Tables
import graft.plans.Alerting
import graft.sources.QueueStore

/** Drives the S10→S11 path end-to-end over the driver testdata: run an
  * alerting check (per-row comparison DSL), enqueue the alerts, dispatch
  * with a recording notifier, then show the delete-on-read + re-enqueue
  * behavior with a failing notifier.
  *
  * Usage: sbt "runMain graft.tools.AlertDemo /root/testdata/sf0.001"
  */
object AlertDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_alertdemo").toString
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Tables.registerAll(spark, sfDir)
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val out = Alerting.runCheck(spark, Alerting.CheckConfig(
      query = "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > :minPrice",
      parameters = Map("minPrice" -> 300000),
      groups = Seq("mail"),
      message = "order {o_orderkey} is suspiciously large: {o_totalprice}",
      checksPerLine = Seq("{o_totalprice} <= 400000"),
      logName = Some("big_orders"),
      logMessage = "checked order {o_orderkey}"), now)

    println(s"alerts: ${out.alerts.count()}  logs: ${out.logs.count()}")
    out.alerts.show(5, 80)

    val q = new QueueStore(spark, root)
    q.enqueue("alerts", out.alerts)
    println(s"queued: ${q.peek("alerts", Alerting.alertSchema).count()}")

    val rec = new Alerting.RecordingNotifier
    Alerting.dispatch(spark, q, "alerts", Seq("mail"), rec)
    println(s"dispatched batches: ${rec.sent.size}; " +
      s"first group: ${rec.sent.headOption.map(_._1).getOrElse("-")}; " +
      s"alerts in batch: ${rec.sent.headOption.map(_._2.size).getOrElse(0)}")
    println(s"queue after dispatch: ${q.peek("alerts", Alerting.alertSchema).count()}")

    q.enqueue("alerts", out.alerts)
    Alerting.dispatch(spark, q, "alerts", Seq("mail"), new Alerting.FailingNotifier)
    println(s"queue after FAILED dispatch (re-enqueued): " +
      s"${q.peek("alerts", Alerting.alertSchema).count()}")
    spark.stop()
  }
}
