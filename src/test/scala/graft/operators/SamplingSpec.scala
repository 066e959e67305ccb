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
}
