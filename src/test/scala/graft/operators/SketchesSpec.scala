package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish token stream: token t_i appears ~1000/i times. */
  private def tokens = {
    val rows = for {
      i <- 1 to 60
      _ <- 1 to (1000 / i)
    } yield s"tok$i"
    rows.toDF("tok")
  }

  test("heavyHitters equals the exact groupBy at every threshold") {
    for (t <- Seq(1L, 40L, 100L, 500L, 2000L)) {
      val got = Sketches.heavyHitters(tokens, "tok", t, eps = 1e-3)
        .as[(String, Long)].collect().toMap
      val want = tokens.groupBy("tok").agg(count(lit(1)).as("c"))
        .filter(col("c") >= t).as[(String, Long)].collect().toMap
      assert(got === want, s"threshold=$t")
    }
  }

  test("heavyHitters survives an adversarially tight sketch (wide eps)") {
    // eps 0.5 → width 6: massive collision mass, every key may pass the
    // prefilter — the exact recount must still produce the exact answer
    val got = Sketches.heavyHitters(tokens, "tok", 200L, eps = 0.5)
      .as[(String, Long)].collect().toMap
    val want = tokens.groupBy("tok").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 200L).as[(String, Long)].collect().toMap
    assert(got === want)
  }

  test("heavyHitters ignores nulls") {
    val withNulls = tokens.union(Seq.fill(500)(null: String).toDF("tok"))
    val got = Sketches.heavyHitters(withNulls, "tok", 300L, eps = 1e-3)
      .as[(String, Long)].collect().toMap
    assert(!got.contains(null) && got("tok1") === 1000L)
  }

  test("approxDistinct is within the HLL error bound and exact-adjacent on small groups") {
    val df = (0 until 10000).map(i => (s"g${i % 3}", s"v${i % (500 * (i % 3 + 1))}"))
      .toDF("g", "v")
    val approx = Sketches.approxDistinct(df, Seq("g"), "v")
      .as[(String, Long)].collect().toMap
    val exact = df.groupBy("g").agg(count_distinct(col("v")).as("d"))
      .as[(String, Long)].collect().toMap
    for ((g, e) <- exact) {
      val a = approx(g).toDouble
      assert(math.abs(a - e) / e <= 0.05, s"group $g: approx $a vs exact $e")
    }
  }

  test("batch sketches merged == one-shot sketch estimate") {
    val df = (0 until 5000).map(i => (s"g${i % 2}", s"v${i % 700}", i % 4))
      .toDF("g", "v", "batch")
    // per-batch sketches, then union up to the group level
    val perBatch = Sketches.distinctSketches(df, Seq("g", "batch"), "v")
    val merged = Sketches.mergeDistinctSketches(perBatch, Seq("g"))
      .as[(String, Long)].collect().toMap
    val oneShot = Sketches.approxDistinct(df, Seq("g"), "v")
      .as[(String, Long)].collect().toMap
    assert(merged === oneShot)
  }

  test("bloomSemiJoin and bloomAntiJoin partition the left side exactly") {
    val left = (1L to 5000L).map(i => (i, s"g${i % 4}")).toDF("k", "tag")
    val right = (1L to 5000L).filter(_ % 7 == 0).map(i => (i, "r"))
      .toDF("rk", "x")
    val semi = Sketches.bloomSemiJoin(left, "k", right, "rk", 1000L)
      .select("k").as[Long].collect().toSet
    val anti = Sketches.bloomAntiJoin(left, "k", right, "rk", 1000L)
      .select("k").as[Long].collect().toSet
    val want = (1L to 5000L).filter(_ % 7 == 0).toSet
    assert(semi === want)
    assert(anti === (1L to 5000L).toSet -- want)
    assert(semi.size + anti.size === 5000)
  }

  test("bloom joins stay exact even with a saturated (high-fpp) filter") {
    val left = (1L to 2000L).map(i => (i, i)).toDF("k", "p")
    val right = Seq((3L, 0), (999L, 0), (2000L, 0)).toDF("rk", "z")
    // expectedItems far below reality → filter saturates, everything
    // becomes a candidate — the exact join must still give the answer
    val semi = Sketches.bloomSemiJoin(left, "k", right, "rk",
      expectedItems = 2L, fpp = 0.5).select("k").as[Long].collect().toSet
    assert(semi === Set(3L, 999L, 2000L))
    val anti = Sketches.bloomAntiJoin(left, "k", right, "rk",
      expectedItems = 2L, fpp = 0.5).select("k").as[Long].collect().toSet
    assert(anti === (1L to 2000L).toSet -- Set(3L, 999L, 2000L))
  }

  test("bloom join build-side cap fails fast") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Sketches.bloomSemiJoin(df, "a", df, "b", expectedItems = 1000L,
        maxExpectedItems = 10L)
    }
  }

  test("quantiles interpolates exactly; approxQuantiles lands within rank error") {
    // 1..1001 in one group: p25 = 251, median = 501, p75 = 751 (exact
    // interpolation indices: p*(n-1) integral by construction)
    val df = (1 to 1001).map(i => ("g", i.toDouble)).toDF("g", "v")
    val ex = Sketches.quantiles(df, Seq("g"), "v",
      Seq(("p25", 0.25), ("median", 0.5), ("p75", 0.75)))
      .as[(String, Double, Double, Double)].head()
    assert(ex === (("g", 251.0, 501.0, 751.0)))
    val ap = Sketches.approxQuantiles(df, Seq("g"), "v",
      Seq(("median", 0.5)), accuracy = 100)
      .as[(String, Double)].head()
    // rank error <= n/accuracy ≈ 10 ranks → value within ±11
    assert(math.abs(ap._2 - 501.0) <= 11.0, s"approx median ${ap._2}")
  }

  test("quantiles interpolates between adjacent values on fractional ranks") {
    // 4 values: median index 1.5 → (20+30)/2
    val df = Seq(("g", 10.0), ("g", 20.0), ("g", 30.0), ("g", 40.0)).toDF("g", "v")
    val m = Sketches.quantiles(df, Seq("g"), "v", Seq(("median", 0.5)))
      .as[(String, Double)].head()
    assert(m._2 === 25.0)
  }

  test("sketch probes run as native filters at the scan, not Scala UDFs") {
    // parquet-backed (a local relation folds the filter at optimize
    // time): the probe must appear as a DataFilter on the FileScan —
    // inside the codegen span — and no scala_udf anywhere
    val dir = java.nio.file.Files.createTempDirectory("graft_skp").toString
    (1 to 2000).map(i => s"tok${i % 40}").toDF("t").write.parquet(s"$dir/t")
    val df = spark.read.parquet(s"$dir/t")
    val hh = Sketches.heavyHitters(df, "t", 10L)
    val hhPlan = hh.queryExecution.executedPlan.toString
    assert(hhPlan.contains("graft_cms_estimate_gte") &&
      !hhPlan.toLowerCase.contains("scala_udf"), hhPlan)
    assert(hh.count() === 40L)
    val right = (1 to 80 by 2).map(i => s"tok$i").toDF("k")
    val semi = Sketches.bloomSemiJoin(df, "t", right, "k", 100L)
    val semiPlan = semi.queryExecution.executedPlan.toString
    assert(semiPlan.contains("graft_bloom_might_contain") &&
      !semiPlan.toLowerCase.contains("scala_udf"), semiPlan)
  }

  test("global merge (no group columns) estimates the corpus cardinality") {
    val df = (0 until 3000).map(i => (s"b${i % 5}", s"v${i % 421}")).toDF("b", "v")
    val est = Sketches.mergeDistinctSketches(
      Sketches.distinctSketches(df, Seq("b"), "v"), Seq.empty)
      .as[Long].head()
    assert(math.abs(est.toDouble - 421.0) / 421.0 <= 0.05)
  }
}
