package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SequencesSpec extends SparkSpec {
  import spark.implicits._

  test("chunkDocuments windows with overlap, short tail, empty-doc drop") {
    // 10 tokens, size 4, overlap 1 → step 3 → chunks at 0,3,6 (a start at
    // 9 would cover only token "j", already inside chunk 2 — not emitted)
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x y"),          // shorter than size → one short chunk
      (3L, "   "),          // zero tokens → no chunks
      (4L, "p q r s"),      // exactly size → one chunk, no redundant tail
      (5L, "p q r s t")     // one past size → short second chunk
    ).toDF("id", "text")
    val out = Sequences.chunkDocuments(docs, "id", "text", size = 4, overlap = 1)
      .orderBy("id", "chunk_ix")
      .as[(Long, Int, String, Int)].collect()
    assert(out.toSeq === Seq(
      (1L, 0, "a b c d", 4),
      (1L, 1, "d e f g", 4),
      (1L, 2, "g h i j", 4),
      (2L, 0, "x y", 2),
      (4L, 0, "p q r s", 4),
      (5L, 0, "p q r s", 4),
      (5L, 1, "s t", 2)))
  }

  test("chunkDocuments with zero overlap tiles the doc exactly") {
    val docs = Seq((1L, "a b c d e")).toDF("id", "text")
    val out = Sequences.chunkDocuments(docs, "id", "text", size = 2, overlap = 0)
      .orderBy("chunk_ix").as[(Long, Int, String, Int)].collect()
    assert(out.toSeq === Seq(
      (1L, 0, "a b", 2), (1L, 1, "c d", 2), (1L, 2, "e", 1)))
    // every token appears exactly once across chunks
    assert(out.map(_._4).sum === 5)
  }

  test("chunkDocuments rejects bad geometry") {
    val docs = Seq((1L, "a")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Sequences.chunkDocuments(docs, "id", "text", size = 4, overlap = 4)
    }
    intercept[IllegalArgumentException] {
      Sequences.chunkDocuments(docs, "id", "text", size = 0, overlap = 0)
    }
  }

  test("dropRepeatedBlocks removes corpus-repeated blocks, keeps order") {
    // block size 3: doc 1 = [boiler][uniq1][boiler2], doc 2 = [boiler][uniq2],
    // doc 3 = [boiler2][uniq3], doc 4 entirely boilerplate
    val boiler = "cookie notice here"
    val boiler2 = "all rights reserved"
    val docs = Seq(
      (1L, s"$boiler one two three $boiler2"),
      (2L, s"$boiler four five six"),
      (3L, s"$boiler2 seven eight nine"),
      (4L, s"$boiler $boiler2")
    ).toDF("id", "text")
    val out = Sequences.dropRepeatedBlocks(docs, "id", "text",
        blockSize = 3, minDf = 2)
      .orderBy("id").as[(Long, String)].collect()
    assert(out.toSeq === Seq(
      (1L, "one two three"),
      (2L, "four five six"),
      (3L, "seven eight nine")))
  }

  test("dropRepeatedBlocks leaves a corpus without repeats untouched") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "f g h i j")
    ).toDF("id", "text")
    val out = Sequences.dropRepeatedBlocks(docs, "id", "text", 3, 2)
      .orderBy("id").as[(Long, String)].collect()
    assert(out.toSeq === Seq((1L, "a b c d e"), (2L, "f g h i j")))
  }

  test("packSequences matches a driver-side replay of the same order") {
    val docs = (1L to 200L).map(i => (i, 1L + i % 7)).toDF("id", "n")
    val out = Sequences.packSequences(docs, "id", "n", seqLen = 10L,
        salt = "s1", buckets = 8)
      .select("id", "n", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // replay: same salted hash order, single-threaded running total
    val hashed = out.map { case (id, n, _, _) =>
      val s = id.toString + "s1"
      val h = s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
      (h, id, n)
    }.sortBy(t => (t._1, t._2))
    var cum = 0L
    val expect = hashed.map { case (_, id, n) =>
      val before = cum; cum += n
      (id, n, before / 10L, before % 10L)
    }.sortBy(_._1)
    assert(out.toSeq === expect.toSeq)
    // packing invariant: total tokens == last seq_id * len + last offset + last n
    val totalTokens = out.map(_._2).sum
    assert(cum === totalTokens)
  }

  test("packSequences is replay-stable and budget-monotone under repartition") {
    val docs = (1L to 100L).map(i => (i, 3L)).toDF("id", "n")
    val a = Sequences.packSequences(docs, "id", "n", 7L, "v")
      .select("id", "seq_id", "seq_offset").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    val b = Sequences.packSequences(docs.repartition(13), "id", "n", 7L, "v")
      .select("id", "seq_id", "seq_offset").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("dedupBlocksKeepFirst keeps the first occurrence, drops repeats") {
    // block size 2: doc 1 = [a b][c d], doc 2 = [a b][e f], doc 3 = [c d]
    // → doc 1 keeps both (first everywhere), doc 2 loses "a b", doc 3
    // drops entirely (its only block repeats doc 1's)
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b e f"),
      (3L, "c d")
    ).toDF("id", "text")
    val out = Sequences.dedupBlocksKeepFirst(docs, "id", "text", blockSize = 2)
      .orderBy("id").as[(Long, String)].collect()
    assert(out.toSeq === Seq((1L, "a b c d"), (2L, "e f")))
  }

  test("dedupBlocksKeepFirst keeps in-doc order and dedupes within a doc too") {
    // the same block twice INSIDE one doc: second occurrence drops
    val docs = Seq((5L, "x y x y z w")).toDF("id", "text")
    val out = Sequences.dedupBlocksKeepFirst(docs, "id", "text", blockSize = 2)
      .as[(Long, String)].collect()
    assert(out.toSeq === Seq((5L, "x y z w")))
  }

  test("dedupBlocksKeepFirst differs from dropRepeatedBlocks on the first copy") {
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("id", "text")
    val keepFirst = Sequences.dedupBlocksKeepFirst(docs, "id", "text", 2)
      .as[(Long, String)].collect().toSeq
    val dropAll = Sequences.dropRepeatedBlocks(docs, "id", "text", 2, minDf = 2)
      .as[(Long, String)].collect().toSeq
    assert(keepFirst === Seq((1L, "a b")))  // survivor: exactly one copy
    assert(dropAll === Seq.empty)           // boilerplate rule: all copies go
  }
}
