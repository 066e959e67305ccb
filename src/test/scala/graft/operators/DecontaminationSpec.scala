package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private val evalSet = Seq("the quick brown fox jumps over").toDF("text")

  test("overlapStats computes per-doc distinct-gram overlap fractions") {
    val docs = Seq(
      // grams (n=3): 4 distinct, 4 hit ("the quick brown", "quick brown fox", ...)
      (1L, "the quick brown fox jumps over"),
      // 4 distinct grams, 2 hit
      (2L, "the quick brown fox eats cheese"),
      // no overlap
      (3L, "completely unrelated text entirely here"),
      // fewer than n tokens → no grams
      (4L, "two words")
    ).toDF("id", "text")
    val out = Decontamination.overlapStats(docs, "id", "text",
        evalSet, "text", n = 3)
      .orderBy("id").as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq === Seq(
      (1L, 4L, 4L, 1.0),
      (2L, 4L, 2L, 0.5),
      (3L, 3L, 0L, 0.0),
      (4L, 0L, 0L, 0.0)))
  }

  test("overlapStats counts DISTINCT grams (repeats don't inflate the rate)") {
    val docs = Seq((1L, "a b c a b c a b c")).toDF("id", "text")
    val ev = Seq("a b c").toDF("text")
    val out = Decontamination.overlapStats(docs, "id", "text", ev, "text", 3)
      .as[(Long, Long, Long, Double)].head()
    // distinct 3-grams: "a b c", "b c a", "c a b" — one hit
    assert(out === ((1L, 3L, 1L, 1.0 / 3.0)))
  }

  test("gram index: incremental appends check equal to the one-shot scan") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "no shared grams in this document at all friend"),
      (3L, "the quick brown fox jumps elsewhere entirely now"),
      (4L, "short one")
    ).toDF("id", "text")
    val ev = Seq("the quick brown fox jumps").toDF("text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_gramidx_").toString
    val idx = new Decontamination.GramIndex(spark, root, "t", n = 5,
      nStoreBuckets = 2)
    idx.append(docs.filter(col("id") <= 2), "id", "text")
    idx.append(docs.filter(col("id") > 2), "id", "text")
    val viaIndex = idx.check(ev, "text").as[Long].collect().sorted.toSeq
    val oneShot = Decontamination.contaminatedIds(docs, "id", "text",
      ev, "text", 5).as[Long].collect().sorted.toSeq
    assert(viaIndex === oneShot && viaIndex === Seq(1L, 3L))
    // a benchmark with no overlap flags nothing
    assert(idx.check(Seq("zero overlap here with anything")
      .toDF("text"), "text").count() === 0)
  }

  test("thresholding overlapStats strictly widens contaminatedIds") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "no shared grams in this document at all"),
      (3L, "the quick brown cat sleeps")
    ).toDF("id", "text")
    val flagged = Decontamination.contaminatedIds(docs, "id", "text",
      evalSet, "text", 3).as[Long].collect().toSet
    val rated = Decontamination.overlapStats(docs, "id", "text",
        evalSet, "text", 3)
      .filter(col("overlap_rate") > 0).select("id").as[Long].collect().toSet
    // any-gram flag == rate > 0 (same gram semantics, two granularities)
    assert(flagged === rated)
    assert(flagged === Set(1L, 3L))
  }
}
