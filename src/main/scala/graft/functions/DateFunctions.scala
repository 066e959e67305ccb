package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's date helpers as Column programs (SURVEY §2.8 date/time):
  *  - dateDaysAgo dynamic parameter
  *    (/root/reference/service/bigquery/query_helper.py:73-78)
  *  - previous year/month/week/day ranges with month snapping
  *    (/root/reference/modules/aggregation/custom/google_search_console.py:214-238)
  *  - weekday gate (/root/reference/modules/aggregation/custom/sistrix_domain.py:154-160)
  */
object DateFunctions {

  /** `dateDaysAgo: n` → current_date - n. */
  def dateDaysAgo(n: Int): Column = date_sub(current_date(), n)

  /** First day of the month before `d`'s month. */
  def prevMonthStart(d: Column): Column =
    date_trunc("month", add_months(d, -1)).cast("date")

  /** Last day of the month before `d`'s month (month snap via last_day —
    * the reference uses calendar.monthrange). */
  def prevMonthEnd(d: Column): Column = last_day(add_months(d, -1))

  /** Same weekday one week earlier. */
  def prevWeekSameDay(d: Column): Column = date_sub(d, 7)

  /** Previous day. */
  def prevDay(d: Column): Column = date_sub(d, 1)

  /** Same date one year earlier (Feb 29 clamps to Feb 28, matching
    * dateutil.relativedelta semantics the reference relies on). */
  def prevYearSameDay(d: Column): Column = add_months(d, -12)

  /** Full English weekday name, for the reference's onlyOnWeekday gate
    * (matches %A; the gate itself is driver logic comparing to config). */
  def weekdayName(d: Column): Column = date_format(d, "EEEE")

  /** True when `d` falls on the configured weekday (full name, e.g.
    * "Monday" — case-insensitive like the reference's comparison). */
  def onWeekday(d: Column, weekday: String): Column =
    lower(weekdayName(d)) === weekday.toLowerCase
}
