package graft.operators

import graft.SparkSpec

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("rareTokenRatio counts distinct tokens under the df threshold") {
    // "common" appears in 3 docs, "shared" in 2, the rest in 1
    val docs = Seq(
      (1L, "common shared uniqueone"),
      (2L, "common shared"),
      (3L, "common uniquetwo uniquetwo"),  // repeat → one DISTINCT token
      (4L, "   ")                          // zero tokens
    ).toDF("id", "text")
    val out = CorpusStats.rareTokenRatio(docs, "id", "text", minDf = 3L)
      .orderBy("id").as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq === Seq(
      (1L, 3L, 2L, 2.0 / 3.0), // shared(df2) + uniqueone(df1) rare
      (2L, 2L, 1L, 0.5),
      (3L, 2L, 1L, 0.5),       // uniquetwo counted once despite repeat
      (4L, 0L, 0L, 0.0)))
  }

  test("rareTokenRatio with minDf=1 marks nothing rare") {
    val docs = Seq((1L, "a b c")).toDF("id", "text")
    val out = CorpusStats.rareTokenRatio(docs, "id", "text", minDf = 1L)
      .as[(Long, Long, Long, Double)].head()
    assert(out === ((1L, 3L, 0L, 0.0)))
  }
}
