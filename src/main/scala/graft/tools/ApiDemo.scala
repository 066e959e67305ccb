package graft.tools

import java.time.LocalDate
import org.apache.spark.sql.SparkSession
import graft.sources._

/** Drives the API-shaped sources (S4 pagespeed, S5 GSC, S6 GA) end-to-end
  * against deterministic fixture APIs: import → warehouse, replay →
  * idempotent, missing data → retry queue → replay with original date.
  *
  * Usage: sbt "runMain graft.tools.ApiDemo"
  */
object ApiDemo {
  def main(args: Array[String]): Unit = {
    val root = java.nio.file.Files.createTempDirectory("graft_apidemo").toString
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = new Warehouse(spark, root)
    val q = new QueueStore(spark, root)

    // ---- GSC with previous-period joins + late-data retry
    val gscApi = new SearchAnalyticsApi {
      override def query(property: String, searchType: String,
                         start: LocalDate, end: LocalDate,
                         dimensions: Seq[String], startRow: Int,
                         rowLimit: Int): Seq[GscRow] =
        if (start.isAfter(LocalDate.of(2024, 3, 14)) && property.contains("late"))
          Seq.empty
        else (0 until 3).map(i => GscRow(dimensions.map(d => s"$d-$i"),
          start.getDayOfMonth * 100.0 + i, start.getDayOfMonth * 1000.0 + i,
          0.1, 3.0)).drop(startRow)
    }
    val specs = Seq(
      GscConfig("https://ok.com/", "gsc", LocalDate.of(2024, 3, 15),
        Seq("page", "device"), Seq("web"), Seq("day", "month")),
      GscConfig("https://late.com/", "gsc", LocalDate.of(2024, 3, 15),
        Seq("page", "device"), Seq("web")))
    println("run1: " + GscSource.run(spark, gscApi, specs, wh, q))
    println("replay: " + GscSource.run(spark, gscApi, specs, wh, q))
    wh.read("gsc").orderBy("property", "page").show(4, 34)

    // ---- GA convention-typed import
    val gaApi = new GaReportingApi {
      override def batchGet(view: String, date: LocalDate, metrics: Seq[String],
                            dimensions: Seq[String], pageToken: Option[String],
                            pageSize: Int): GaPage =
        GaPage(dimensions.map("ga:" + _) ++ metrics.map("ga:" + _),
          (0 until 4).map(i => dimensions.map(d => s"/$d$i") ++
            metrics.map(_ => (i * 10).toString)), None)
    }
    GaSource.importView(spark, gaApi, GaConfig("99", "ga",
      LocalDate.of(2024, 4, 1), Seq("sessions", "bounceRate"),
      Seq("pagePath")), wh)
    wh.read("ga").printSchema()
    wh.read("ga").show(4)

    spark.stop()
  }
}
