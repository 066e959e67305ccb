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
}
