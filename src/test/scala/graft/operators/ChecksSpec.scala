package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Checks.Spec

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  test("run evaluates all specs in one pass, one row per (row, check)") {
    val df = Seq(("u1", 95.0), ("u2", 40.0)).toDF("url", "score")
    val out = Checks.run(df, Seq(
      Checks.atLeast("score_ok", col("score"), 50.0),
      Checks.atMost("score_small", col("score"), 90.0)), Seq("url"))
    assert(out.count() === 4)
    val m = out.select("url", "check", "valid").as[(String, String, Boolean)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(m(("u1", "score_ok")) && !m(("u2", "score_ok")))
    assert(!m(("u1", "score_small")) && m(("u2", "score_small")))
  }

  test("equalsCheck reports expected value in error") {
    val df = Seq(("u1", "200"), ("u2", "404")).toDF("url", "status")
    val out = Checks.run(df,
      Seq(Checks.equalsCheck("status_200", col("status"), lit("200"))), Seq("url"))
    val rows = out.select("url", "valid", "error").as[(String, Boolean, String)]
      .collect().toMap2
    assert(rows("u1") === ((true, "")))
    assert(rows("u2") === ((false, "expected 200")))
  }

  test("countAlert fires on non-empty result, negate inverts") {
    val hits = Seq(1, 2, 3).toDF("x")
    val none = hits.limit(0)
    assert(Checks.countAlert(hits).select("alert").head().getBoolean(0))
    assert(!Checks.countAlert(none).select("alert").head().getBoolean(0))
    assert(Checks.countAlert(none, negate = true).select("alert").head().getBoolean(0))
    assert(!Checks.countAlert(hits, negate = true).select("alert").head().getBoolean(0))
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
