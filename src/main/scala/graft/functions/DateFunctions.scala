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

  // -------------------------------------------------------------- timezones
  //
  // The reference's timezone machinery (utilities/datetime.py:5-19 plus
  // the Europe/Berlin normalization in sistrix_domain.py:71-74 and
  // sistrix_optimizer.py:139). Sessions here pin UTC (oracle parity), so
  // zone conversion is always EXPLICIT — never via the session timezone,
  // which would silently differ between driver and executors on a real
  // cluster.

  /** Resolve the reference's timezone specials: `utc` → UTC, `local` →
    * the configured deployment zone (the reference reads the host zone;
    * on a cluster that must be an explicit config, not the executor OS),
    * anything else → the named IANA zone, case preserved. */
  def resolveZone(spec: String, localZone: String = "UTC"): String =
    if (spec.equalsIgnoreCase("utc")) "UTC"
    else if (spec.equalsIgnoreCase("local")) localZone
    else spec

  /** Wall-clock timestamp in `zone` for a UTC instant (DST-aware). */
  def toZone(tsUtc: Column, zone: String): Column =
    from_utc_timestamp(tsUtc, zone)

  /** UTC instant for a wall-clock timestamp read in `zone` (DST-aware;
    * the spring-forward gap maps like java.time: shifted by the offset
    * in force after the transition). */
  def fromZone(tsLocal: Column, zone: String): Column =
    to_utc_timestamp(tsLocal, zone)

  /** The Sistrix date normalization: the API reports Europe/Berlin
    * wall-clock time, so the date KEY is the Berlin calendar date of the
    * instant — one day off from the UTC date for late-evening rows. */
  def localDate(tsUtc: Column, zone: String = "Europe/Berlin"): Column =
    to_date(from_utc_timestamp(tsUtc, zone))

  /** Driver-side "today" in the configured zone — the reference runs its
    * weekday gates and request-date keys on Europe/Berlin wall-clock, not
    * UTC (sistrix_domain.py:71-74); pass this as
    * `SistrixDomainSource.importDaily(..., today = todayIn(zone))`. */
  def todayIn(zone: String): java.time.LocalDate =
    java.time.LocalDate.now(java.time.ZoneId.of(resolveZone(zone)))
}
