package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 200L).map(i => (i, s"lang${i % 3}"))
    .toDF("id", "lang")

  test("deterministicSplit is stable under repartitioning and replay") {
    val a = Sampling.deterministicSplit(docs, "id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10), salt = "s")
      .select("id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.deterministicSplit(docs.repartition(7), "id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10), salt = "s")
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a === b, "assignment is a pure function of id")
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
    assert(counts.values.sum === 200)
  }

  test("different salt reshuffles the split") {
    val a = Sampling.deterministicSplit(docs, "id", Seq("x" -> 50, "y" -> 50),
      salt = "s1").select("id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.deterministicSplit(docs, "id", Seq("x" -> 50, "y" -> 50),
      salt = "s2").select("id", "split").as[(Long, String)].collect().toMap
    assert(a !== b)
  }

  test("stratifiedTopK takes exactly k per stratum, deterministically") {
    val s1 = Sampling.stratifiedTopK(docs, Seq("lang"), "id", 4)
      .select("id").as[Long].collect().sorted.toSeq
    val s2 = Sampling.stratifiedTopK(docs.repartition(5), Seq("lang"), "id", 4)
      .select("id").as[Long].collect().sorted.toSeq
    assert(s1 === s2)
    assert(s1.size === 12, "3 strata x 4")
  }

  test("tokenBudgetSample keeps the hash-order prefix within budget") {
    val d = docs.withColumn("n_tokens", (col("id") % 7 + 1).cast("long"))
    val sample = Sampling.tokenBudgetSample(d, "id", "n_tokens",
        budget = 50L, salt = "v1")
      .select("id", "n_tokens").as[(Long, Long)].collect()
    // total within budget, and membership = driver-side replay of the
    // same hash order (the executable spec)
    assert(sample.map(_._2).sum <= 50L)
    val all = d.select("id", "n_tokens").as[(Long, Long)].collect()
    def h(id: Long) = {
      var acc = 0L
      s"${id}v1".foreach(c => acc = (acc * 31 + c.toLong) % 1000000007L)
      acc
    }
    val expected = all.sortBy(r => (h(r._1), r._1))
      .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (id, n)) => (id, n, cum + n) }
      .drop(1).takeWhile(_._3 <= 50L).map(_._1).toSet
    assert(sample.map(_._1).toSet === expected)
    // monotone: a bigger budget only adds documents
    val bigger = Sampling.tokenBudgetSample(d, "id", "n_tokens",
        budget = 80L, salt = "v1")
      .select("id").as[Long].collect().toSet
    assert(sample.map(_._1).toSet.subsetOf(bigger))
  }

  test("quotaSample applies per-stratum quotas with a default") {
    val out = Sampling.quotaSample(docs, "lang", "id",
        Seq("lang0" -> 5, "lang1" -> 2), defaultK = 1, salt = "v1")
      .groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(out("lang0") === 5L && out("lang1") === 2L)
    assert(out("lang2") === 1L, "unlisted stratum gets the default quota")
    // deterministic under repartitioning
    val a = Sampling.quotaSample(docs, "lang", "id",
        Seq("lang0" -> 5), 2, "s").select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.quotaSample(docs.repartition(7), "lang", "id",
        Seq("lang0" -> 5), 2, "s").select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("fractionSample keeps rows by salted hash threshold, replay-stable") {
    val docs = (1L to 2000L).map(i => (i, s"lang${i % 4}")).toDF("id", "lang")
    val out = Sampling.fractionSample(docs, "lang", "id",
      Seq("lang0" -> 0.5, "lang1" -> 0.0), defaultFraction = 0.1, salt = "s")
    val byLang = out.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    // lang1 fraction 0 drops everything; rates land near the targets
    assert(!byLang.contains("lang1"))
    assert(byLang("lang0") > 200 && byLang("lang0") < 300) // 500 × 0.5 ± noise
    assert(byLang("lang2") > 20 && byLang("lang2") < 80)   // 500 × 0.1 ± noise
    // replay + repartition stability, and monotone in the fraction
    val again = Sampling.fractionSample(docs.repartition(13), "lang", "id",
      Seq("lang0" -> 0.5, "lang1" -> 0.0), 0.1, "s")
      .select("id").as[Long].collect().sorted.toSeq
    assert(again === out.select("id").as[Long].collect().sorted.toSeq)
    val wider = Sampling.fractionSample(docs, "lang", "id",
      Seq("lang0" -> 0.8, "lang1" -> 0.0), 0.1, "s")
      .select("id").as[Long].collect().toSet
    assert(out.select("id").as[Long].collect().toSet.subsetOf(wider))
  }

  test("temperatureFractions flattens the mix as alpha decreases") {
    // 900 en, 90 de, 10 xx
    val docs = ((1L to 900L).map(i => (i, "en")) ++
      (901L to 990L).map(i => (i, "de")) ++
      (991L to 1000L).map(i => (i, "xx"))).toDF("id", "lang")
    val natural = Sampling.temperatureFractions(docs, "lang", 1.0, 500).toMap
    // α=1: every stratum keeps the same fraction (budget/N)
    assert(natural.values.map(v => math.round(v * 1e9)).toSet.size === 1)
    // budget 100 keeps every stratum below the 1.0 cap (xx: 0.74)
    val flat = Sampling.temperatureFractions(docs, "lang", 0.5, 100).toMap
    // α=0.5 upsamples the tail relative to the head
    assert(flat("xx") > flat("de") && flat("de") > flat("en"))
    // shares sum to the budget (uncapped strata)
    val kept = flat.map { case (l, f) =>
      f * Map("en" -> 900, "de" -> 90, "xx" -> 10)(l) }.sum
    assert(math.abs(kept - 100.0) < 1e-6)
    // a tiny budget caps nothing; a huge one caps everything at 1.0
    val capped = Sampling.temperatureFractions(docs, "lang", 0.5, 10000).toMap
    assert(capped.values.forall(_ === 1.0))
    // feeding them to the sampler approximates the target mix: the tail
    // stratum's kept COUNT comes out near the head's despite being 90×
    // rarer in the corpus
    val sampled = Sampling.fractionSample(docs, "lang", "id",
        flat.toSeq, 0.0, "t").groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(sampled("xx") >= 4 && sampled("de") >= 10,
      s"tail strata materially present in the mix: $sampled")
  }

  test("topFractionByScore keeps each stratum's top quarter, ties included") {
    // stratum a: scores 1..100 → 0.75-quantile 75.25, keeps 76..100 (25)
    // stratum b: constant score → threshold == score, EVERY row kept
    val rows = (1 to 100).map(i => ("a", i.toLong, i.toDouble)) ++
      (1 to 8).map(i => ("b", 1000L + i, 5.0))
    val df = rows.toDF("s", "id", "score")
    val out = Sampling.topFractionByScore(df, "s", "score", 0.25)
      .select("s", "id").as[(String, Long)].collect()
    val byStratum = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byStratum("a") === (76 to 100).map(_.toLong).toSet)
    assert(byStratum("b") === (1 to 8).map(i => 1000L + i).toSet)
    // approx mode on the same small data lands on the same membership
    val approx = Sampling.topFractionByScore(df, "s", "score", 0.25,
        approx = true).select("s", "id").as[(String, Long)].collect().toSet
    assert(approx.count(_._1 == "a") >= 24 && approx.count(_._1 == "a") <= 26)
    assert(approx.count(_._1 == "b") === 8)
  }

  test("topFractionByScore gates null-stratum rows by their own threshold") {
    // the null stratum has scores 1..4; frac 0.5 → threshold 2.5 keeps
    // {3, 4}. A plain equi-join back would drop every null-stratum row.
    val rows = (1 to 4).map(i => (Option.empty[String], i.toLong, i.toDouble)) ++
      (1 to 4).map(i => (Option("a"), 100L + i, i.toDouble))
    val out = Sampling.topFractionByScore(rows.toDF("s", "id", "score"),
        "s", "score", 0.5)
      .select("s", "id").as[(Option[String], Long)].collect().toSet
    assert(out === Set((None, 3L), (None, 4L),
      (Some("a"), 103L), (Some("a"), 104L)))
  }

  test("repeatSample: epoch oversampling — copy counts, rep indices, " +
      "fraction-degenerate equivalence") {
    val docs = ((1L to 400L).map(i => (i, "hq")) ++
      (401L to 800L).map(i => (i, "bulk"))).toDF("id", "s")
    val out = Sampling.repeatSample(docs, "s", "id",
        Seq("hq" -> 2.5), defaultFactor = 0.5, salt = "v1")
      .select("id", "s", "rep").as[(Long, String, Int)].collect()
    val byId = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    // every hq row appears 2 or 3 times with contiguous rep indices
    (1L to 400L).foreach { i =>
      assert(byId(i) == Seq(0, 1) || byId(i) == Seq(0, 1, 2), s"id $i")
    }
    // expectation ≈ f per stratum (hash-deterministic, so exact per run)
    val hq = out.count(_._2 == "hq")
    assert(hq >= 400 * 2 && hq <= 400 * 3)
    assert(math.abs(hq - 1000) < 60, s"hq copies $hq vs E=1000")
    val bulk = out.filter(_._2 == "bulk")
    assert(bulk.forall(_._3 == 0) && math.abs(bulk.length - 200) < 40)
    // f <= 1 keeps EXACTLY fractionSample's rows (same hash, same rule)
    val viaRepeat = Sampling.repeatSample(docs, "s", "id",
        Seq("hq" -> 0.3), defaultFactor = 0.7, salt = "z")
      .select("id").as[Long].collect().toSet
    val viaFraction = Sampling.fractionSample(docs, "s", "id",
        Seq("hq" -> 0.3), defaultFraction = 0.7, salt = "z")
      .select("id").as[Long].collect().toSet
    assert(viaRepeat === viaFraction)
    // replay-stable
    val again = Sampling.repeatSample(docs, "s", "id",
        Seq("hq" -> 2.5), defaultFactor = 0.5, salt = "v1")
      .select("id", "s", "rep").as[(Long, String, Int)].collect()
    assert(again.sorted.toSeq === out.sorted.toSeq)
  }
}
