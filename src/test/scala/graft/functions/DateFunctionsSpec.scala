package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Month-boundary and leap-year behavior of the previous-period helpers
  * (reference month snap: google_search_console.py:214-238). */
class DateFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def on(date: String): org.apache.spark.sql.DataFrame =
    Seq(date).toDF("d").select(to_date(col("d")).as("d"))

  private def str(df: org.apache.spark.sql.DataFrame,
                  c: org.apache.spark.sql.Column): String =
    df.select(c.cast("string").as("r")).collect().head.getString(0)

  test("prev month range snaps to first..last day") {
    val d = on("2024-03-15")
    assert(str(d, DateFunctions.prevMonthStart(col("d"))) === "2024-02-01")
    assert(str(d, DateFunctions.prevMonthEnd(col("d"))) === "2024-02-29") // leap
  }

  test("prev month across year boundary") {
    val d = on("2024-01-07")
    assert(str(d, DateFunctions.prevMonthStart(col("d"))) === "2023-12-01")
    assert(str(d, DateFunctions.prevMonthEnd(col("d"))) === "2023-12-31")
  }

  test("prev year clamps Feb 29") {
    assert(str(on("2024-02-29"), DateFunctions.prevYearSameDay(col("d")))
      === "2023-02-28")
  }

  test("prev week / prev day") {
    val d = on("2024-01-03")
    assert(str(d, DateFunctions.prevWeekSameDay(col("d"))) === "2023-12-27")
    assert(str(d, DateFunctions.prevDay(col("d"))) === "2024-01-02")
  }

  test("weekday gate") {
    val d = on("2024-01-01") // a Monday
    assert(str(d, DateFunctions.weekdayName(col("d"))) === "Monday")
    assert(d.select(DateFunctions.onWeekday(col("d"), "monday").as("r"))
      .collect().head.getBoolean(0))
    assert(!d.select(DateFunctions.onWeekday(col("d"), "Friday").as("r"))
      .collect().head.getBoolean(0))
  }

  test("dateDaysAgo is current_date - n") {
    val row = spark.range(1)
      .select(DateFunctions.dateDaysAgo(3).as("a"),
        date_sub(current_date(), 3).as("b")).collect().head
    assert(row.getDate(0) === row.getDate(1))
  }

  // ---------------------------------------------------------- timezones

  private def ts(s: String): org.apache.spark.sql.DataFrame =
    Seq(s).toDF("t").select(to_timestamp(col("t")).as("t"))

  test("resolveZone handles the reference's utc/local specials") {
    assert(DateFunctions.resolveZone("utc") === "UTC")
    assert(DateFunctions.resolveZone("UTC") === "UTC")
    assert(DateFunctions.resolveZone("local", "Europe/Berlin") === "Europe/Berlin")
    assert(DateFunctions.resolveZone("Europe/Berlin") === "Europe/Berlin")
  }

  test("toZone across the March DST boundary (CET +1 → CEST +2)") {
    // Berlin springs forward 2024-03-31 02:00 CET → 03:00 CEST
    assert(str(ts("2024-03-31 00:59:00"),
      DateFunctions.toZone(col("t"), "Europe/Berlin")) === "2024-03-31 01:59:00")
    assert(str(ts("2024-03-31 01:00:00"),
      DateFunctions.toZone(col("t"), "Europe/Berlin")) === "2024-03-31 03:00:00")
  }

  test("toZone across the October DST boundary (CEST +2 → CET +1)") {
    // Berlin falls back 2024-10-27 03:00 CEST → 02:00 CET
    assert(str(ts("2024-10-27 00:59:00"),
      DateFunctions.toZone(col("t"), "Europe/Berlin")) === "2024-10-27 02:59:00")
    assert(str(ts("2024-10-27 01:00:00"),
      DateFunctions.toZone(col("t"), "Europe/Berlin")) === "2024-10-27 02:00:00")
  }

  test("fromZone inverts toZone in both DST regimes") {
    assert(str(ts("2024-07-01 12:00:00"),
      DateFunctions.fromZone(col("t"), "Europe/Berlin")) === "2024-07-01 10:00:00")
    assert(str(ts("2024-01-01 12:00:00"),
      DateFunctions.fromZone(col("t"), "Europe/Berlin")) === "2024-01-01 11:00:00")
  }

  test("localDate rolls late-evening UTC rows to the Berlin next day") {
    assert(str(ts("2024-03-30 23:30:00"),
      DateFunctions.localDate(col("t"))) === "2024-03-31")
    assert(str(ts("2024-03-30 12:00:00"),
      DateFunctions.localDate(col("t"))) === "2024-03-30")
  }
}
