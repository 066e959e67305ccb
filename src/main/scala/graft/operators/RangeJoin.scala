package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range joins over an integer dimension (epoch days/micros, offsets)
  * without the nested-loop trap.
  *
  * Spark executes a bare inequality join (`p BETWEEN s AND e`) as a
  * BroadcastNestedLoopJoin or a cartesian product — O(|L|·|R|) compares
  * and a plan PlanLint rightly refuses. Both operators here turn the
  * range predicate into an EQUI-join on a bin key: the dimension is
  * tiled into `binWidth`-sized bins, intervals explode into the bins
  * they touch, and the residual range predicate runs only within a bin.
  * The plan becomes a plain shuffle/broadcast HASH join — partitioned,
  * AQE-skew-splittable, and linear in matches per bin instead of
  * quadratic in table sizes. This is the standard binned range-join
  * strategy (Databricks' range-join hint, GeoSpark grids).
  *
  * Scale contract: the interval explode factor is (len/binWidth)+1 rows
  * per interval, data-bounded by `maxBinsPerInterval` — an interval that
  * would explode past the cap fails fast inside the scan projection
  * (assert_true) instead of silently inflating the shuffle. Pick
  * binWidth ≈ the typical interval length: one-to-two bins per interval,
  * shuffle ≈ |L| + 2|R|.
  *
  * Both ends INCLUSIVE ([s, e]); bins via exact integer floor-division
  * (no double rounding anywhere, valid over the full Long range).
  */
object RangeJoin {

  /** Exact floor(c / w) on longs, valid over the FULL Long range: SQL
    * `div` (IntegralDivide — truncates toward zero) minus 1 when the
    * Java remainder is negative, i.e. Math.floorDiv. Two pitfalls this
    * dodges: Spark's `/` is IEEE double division even on longs (rounds
    * past 2^53, shifting a bin by one at Long extremes), and the
    * pmod-subtraction formulation (c − pmod(c, w)) overflows for c
    * within w of Long.MinValue. w must be positive (callers require it). */
  private[operators] def floorDiv(c: Column, w: Long): Column = {
    import graft.functions.expressions.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
    val cl = c.cast("long")
    val q = ColumnBridge.column(
      IntegralDivide(ColumnBridge.expression(cl), Literal(w)))
    q - when(cl % lit(w) < 0, 1L).otherwise(0L)
  }

  /** Explode `df` into one row per bin its [s, e] interval touches
    * (column `__bin`). The cap guard runs as a filter BELOW the
    * generate: assert_true yields NULL on pass so `.isNull` keeps every
    * conforming row and a violating interval raises with its bounds —
    * fail-fast instead of a silently inflated shuffle. */
  private def binned(df: DataFrame, sCol: String, eCol: String,
                     w: Long, cap: Int): DataFrame = {
    val s = col(sCol).cast("long")
    val e = col(eCol).cast("long")
    val nb = floorDiv(e, w) - floorDiv(s, w) + lit(1L)
    // an e < s interval is EMPTY — it contains no point and overlaps
    // nothing, so it drops here (a descending `sequence` would otherwise
    // fabricate bins for it and the overlap predicate alone would not
    // filter every such pair)
    df.filter(s <= e)
      .filter(assert_true(nb <= cap,
        concat(lit(s"interval spans more than $cap bins of width $w: ["),
          s, lit(", "), e, lit("]"))).isNull)
      .withColumn("__bin", explode(sequence(floorDiv(s, w), floorDiv(e, w))))
  }

  /** Join `points` to every interval of `intervals` containing them:
    * keeps rows where points(pointCol) ∈ [startCol, endCol]. Inner join;
    * output = all columns of both inputs (names must not collide). A
    * point has exactly ONE bin, so each (point, interval) match surfaces
    * exactly once — no post-join dedup. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binWidth: Long,
                      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = points.columns.toSet intersect intervals.columns.toSet
    require(overlap.isEmpty, s"column names collide: $overlap")
    val p = points.withColumn("__bin",
      floorDiv(col(pointCol).cast("long"), binWidth))
    val i = binned(intervals, startCol, endCol, binWidth, maxBinsPerInterval)
    p.join(i, Seq("__bin"))
      .filter(col(pointCol).cast("long").between(
        col(startCol).cast("long"), col(endCol).cast("long")))
      .drop("__bin")
  }

  /** Join two interval tables on overlap: [ls, le] ∩ [rs, re] ≠ ∅, i.e.
    * ls ≤ re AND rs ≤ le (inclusive ends). Both sides explode into their
    * bins; a surviving pair is emitted ONLY in the first bin both touch
    * (bin = floor(max(ls, rs) / w)), so each overlapping pair surfaces
    * exactly once without a distinct pass. */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
                      right: DataFrame, rStart: String, rEnd: String,
                      binWidth: Long,
                      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = left.columns.toSet intersect right.columns.toSet
    require(overlap.isEmpty, s"column names collide: $overlap")
    val l = binned(left, lStart, lEnd, binWidth, maxBinsPerInterval)
    val r = binned(right, rStart, rEnd, binWidth, maxBinsPerInterval)
    l.join(r, Seq("__bin"))
      .filter(col(lStart).cast("long") <= col(rEnd).cast("long") &&
        col(rStart).cast("long") <= col(lEnd).cast("long"))
      .filter(col("__bin") ===
        floorDiv(greatest(col(lStart).cast("long"), col(rStart).cast("long")),
          binWidth))
      .drop("__bin")
  }
}
