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
}
