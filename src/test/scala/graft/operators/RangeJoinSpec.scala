package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points: DataFrame =
    Seq((1L, 0L), (2L, 5L), (3L, 7L), (4L, 13L), (5L, -3L), (6L, 100L))
      .toDF("pid", "p")

  private def intervals: DataFrame =
    Seq((10L, 0L, 6L),    // catches 0, 5
        (11L, 5L, 13L),   // catches 5, 7, 13
        (12L, -5L, -1L),  // catches -3 (negative domain)
        (13L, 50L, 40L))  // EMPTY (e < s): catches nothing
      .toDF("iid", "s", "e")

  /** Oracle by definition: the plain quadratic filter. */
  private def naivePoint: Set[(Long, Long)] =
    (for {
      (pid, p) <- Seq((1L, 0L), (2L, 5L), (3L, 7L), (4L, 13L), (5L, -3L), (6L, 100L))
      (iid, s, e) <- Seq((10L, 0L, 6L), (11L, 5L, 13L), (12L, -5L, -1L), (13L, 50L, 40L))
      if p >= s && p <= e
    } yield (pid, iid)).toSet

  test("pointInInterval matches the naive quadratic join, any binWidth") {
    for (w <- Seq(1L, 3L, 7L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got === naivePoint, s"binWidth=$w")
    }
  }

  test("pointInInterval emits each matching pair exactly once") {
    val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 2L)
      .groupBy("pid", "iid").count().filter(col("count") > 1).count()
    assert(got === 0L)
  }

  test("intervalOverlap matches the naive quadratic join incl. negatives") {
    val left = Seq((1L, 0L, 10L), (2L, 20L, 25L), (3L, -8L, -2L))
      .toDF("lid", "ls", "le")
    val right = Seq((7L, 9L, 21L), (8L, -4L, 0L), (9L, 26L, 30L), (10L, 3L, 1L))
      .toDF("rid", "rs", "re")
    val naive = (for {
      (lid, ls, le) <- Seq((1L, 0L, 10L), (2L, 20L, 25L), (3L, -8L, -2L))
      (rid, rs, re) <- Seq((7L, 9L, 21L), (8L, -4L, 0L), (9L, 26L, 30L), (10L, 3L, 1L))
      if ls <= le && rs <= re && ls <= re && rs <= le
    } yield (lid, rid)).toSet
    for (w <- Seq(1L, 4L, 13L, 1000L)) {
      val got = RangeJoin.intervalOverlap(left, "ls", "le", right, "rs", "re", w)
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      assert(got === naive, s"binWidth=$w")
      val dups = RangeJoin.intervalOverlap(left, "ls", "le", right, "rs", "re", w)
        .groupBy("lid", "rid").count().filter(col("count") > 1).count()
      assert(dups === 0L, s"duplicate pairs at binWidth=$w")
    }
  }

  test("oversized interval fails fast at the cap") {
    val wide = Seq((1L, 0L, 1000000L)).toDF("iid", "s", "e")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, "p", wide, "s", "e",
        binWidth = 10L, maxBinsPerInterval = 100).count()
    }
    assert(e.getMessage != null)
  }

  test("plan is an equi-join on the bin key, not a nested loop") {
    val joined = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", 7L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("floorDiv is exact past 2^53 (integral div, no IEEE rounding)") {
    import spark.implicits._
    // values where double division rounds the already-floored numerator:
    // (c - pmod(c,w)) near Long extremes is not representable in double
    val vals = Seq(Long.MaxValue, Long.MaxValue - 1, (1L << 60) + 12345L,
      -(1L << 60) - 98765L, Long.MinValue, Long.MinValue + 2,
      Long.MinValue + 999, 9007199254740993L, 0L, -1L, 999L, -999L)
    val w = 1000L
    val got = vals.toDF("c")
      .select(RangeJoin.floorDiv(org.apache.spark.sql.functions.col("c"), w))
      .as[Long].collect().toSeq
    val expect = vals.map(v => Math.floorDiv(v, w))
    assert(got === expect)
  }

  test("column collisions are rejected") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points.withColumnRenamed("pid", "iid"),
        "p", intervals, "s", "e", 7L)
    }
  }
}
