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

  test("vocabulary: counts, dfs, and the deterministic tie-break at the cut") {
    val docs = Seq(
      (1L, "aa aa bb cc"),
      (2L, "aa bb dd"),
      (3L, "aa")
    ).toDF("id", "text")
    // counts: aa=4(df 3), bb=2(df 2), cc=1, dd=1 — topV=3 must break the
    // cc/dd tie by token asc → cc in, dd out
    val out = CorpusStats.vocabulary(docs, "text", topV = 3)
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("aa", 4L, 3L), ("bb", 2L, 2L), ("cc", 1L, 1L)))
  }

  test("tokenShareDrift: hand-checked shares, null ratio for one-sided tokens") {
    val a = Seq((1L, "aa aa bb"), (2L, "aa cc")).toDF("id", "text") // 5 tokens
    val b = Seq((3L, "aa bb bb dd")).toDF("id", "text")             // 4 tokens
    val out = CorpusStats.tokenShareDrift(a, b, "text", topV = 10)
      .as[(String, Long, Long, Double, Double, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("aa") === (("aa", 3L, 1L, 3.0 / 5.0, 1.0 / 4.0,
      Some((3.0 / 5.0) / (1.0 / 4.0)))))
    assert(out("bb") === (("bb", 1L, 2L, 1.0 / 5.0, 2.0 / 4.0,
      Some((1.0 / 5.0) / (2.0 / 4.0)))))
    // cc only in A, dd only in B → no finite ratio
    assert(out("cc")._6.isEmpty && out("dd")._6.isEmpty)
    // the cut is deterministic: topV=2 keeps the combined-count leaders
    val top2 = CorpusStats.tokenShareDrift(a, b, "text", topV = 2)
      .select("tok").as[String].collect().toSet
    assert(top2 === Set("aa", "bb"))
  }

  test("oovRate scores docs against the vocab; empty docs report zero") {
    val docs = Seq(
      (1L, "aa bb zz"),   // zz is OOV → 1/3
      (2L, "aa aa"),      // fully in-vocab
      (3L, "")
    ).toDF("id", "text")
    val vocab = Seq("aa", "bb").toDF("tok")
    val out = CorpusStats.oovRate(docs, "id", "text", vocab)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((3L, 1L, 1.0 / 3.0)))
    assert(out(2L) === ((2L, 0L, 0.0)))
    assert(out(3L) === ((0L, 0L, 0.0)))
  }

  test("sourceStats counts corpus-wide dups per source, not intra-source") {
    // the duplicated text spans BOTH sources: each source sees one dup
    // member even though neither has an internal dup
    val docs = Seq(
      (1L, "the same syndicated story", "a"),
      (2L, "the same syndicated story", "b"),
      (3L, "an original piece of text", "a"),
      (4L, "another original piece here", "b")
    ).toDF("doc_id", "text", "source")
    val out = CorpusStats.sourceStats(docs, "doc_id", "text", "source")
      .orderBy("source")
      .select("source", "n_docs", "n_dup", "dup_share")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out === Seq(("a", 2L, 1L, 0.5), ("b", 2L, 1L, 0.5)))
  }

  test("sourceStats mean_quality is the quantized mean of the row score") {
    val docs = Seq((1L, "the and is of", "a"), (2L, "zzzz 123!!", "a"))
      .toDF("doc_id", "text", "source")
    val perDoc = docs.select(
      org.apache.spark.sql.functions.floor(
        graft.functions.TextFunctions.qualityScore(
          org.apache.spark.sql.functions.col("text")) *
          Clustering.Quant).cast("long"))
      .as[Long].collect()
    val expected = perDoc.sum.toDouble / Clustering.Quant / perDoc.length
    val got = CorpusStats.sourceStats(docs, "doc_id", "text", "source")
      .select("mean_quality").as[Double].head()
    assert(got == expected)
  }

  test("corpusReport counts docs, empties, distinct texts and tokens") {
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "   "),
      (4L, "delta echo")).toDF("doc_id", "text")
    val r = CorpusStats.corpusReport(docs, "doc_id", "text")
      .select("n_docs", "n_empty", "n_distinct", "total_tokens",
        "mean_tokens")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(r == ((4L, 1L, 3L, 8L, 2.0)))
  }

  test("sourceFilter keys dups on keyCol and drops failing sources") {
    // source "spam" shares a 10-char prefix key across its docs →
    // dup_share 1.0 → dropped; "ok" survives on both gates
    val docs = Seq(
      (1L, "identical0 tail one from the mill", "spam"),
      (2L, "identical0 tail two from the mill", "spam"),
      (3L, "the quick brown fox jumps over it", "ok"),
      (4L, "the lazy dog sleeps in the shade!", "ok")
    ).toDF("doc_id", "text", "source")
      .withColumn("k",
        org.apache.spark.sql.functions.substring(
          org.apache.spark.sql.functions.col("text"), 1, 10))
    val kept = CorpusStats.sourceFilter(docs, "doc_id", "text", "source",
        minQuality = 0.0, maxDupShare = 0.5, keyCol = Some("k"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(3L, 4L))
  }
}
