package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic BPE teaching corpus (Sennrich et al. 2016 §3.2 uses the
  // same shape); word frequencies realized as repeated tokens so the
  // word-type aggregation is exercised
  private def classicCorpus = Seq(
    (1L, Array.fill(5)("low").mkString(" ")),
    (2L, Array.fill(2)("lower").mkString(" ")),
    (3L, Array.fill(6)("newest").mkString(" ")),
    (4L, Array.fill(3)("widest").mkString(" "))
  ).toDF("doc_id", "text")

  test("learnMerges reproduces the hand-computed classic merge table") {
    val m = Bpe.learnMerges(classicCorpus, "text", numMerges = 6)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(m === Array(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "est", "</w>", 9L),
      (4, "l", "o", 7L),
      (5, "lo", "w", 7L),
      (6, "e", "w", 6L)))
  }

  test("learnMerges: distributed rounds ≡ driver small-vocab replay") {
    // maxDriverTypes = 0 forces the distributed rounds; the default
    // replays tiny vocabularies on the driver — identical tables, tie
    // order included (non-ASCII words exercise the UTF-8 byte order)
    val corpora = Seq(
      classicCorpus,
      Seq((1L, "aaa aaa ab ba"), (2L, "über üben ügen")).toDF("doc_id", "text"))
    for ((c, i) <- corpora.zipWithIndex) {
      val driver = Bpe.learnMerges(c, "text", numMerges = 8)
        .as[(Int, String, String, Long)].collect().sortBy(_._1)
      val dist = Bpe.learnMerges(c, "text", numMerges = 8,
          maxDriverTypes = 0)
        .as[(Int, String, String, Long)].collect().sortBy(_._1)
      assert(driver === dist, s"corpus $i")
    }
  }

  test("within-word repeats count every adjacency and merge greedily") {
    val d = Seq((1L, "aaa")).toDF("doc_id", "text")
    // ' a a a </w> ': (a,a) has TWO adjacencies -> cnt 2; after the
    // greedy left-to-right merge ' aa a </w> ' no pair reaches 2
    val m = Bpe.learnMerges(d, "text", numMerges = 5, minPairCount = 2L)
      .as[(Int, String, String, Long)].collect()
    assert(m === Array((1, "a", "a", 2L)))
  }

  test("early stop: no merge emitted below minPairCount") {
    val d = Seq((1L, "ab cd")).toDF("doc_id", "text")
    assert(Bpe.learnMerges(d, "text", 3, minPairCount = 2L).count() === 0L)
  }

  test("encode applies merges in rank order over whole documents") {
    val merges = Bpe.learnMerges(classicCorpus, "text", 6)
    val out = Bpe.encode(
      Seq((1L, "lowest low"), (2L, ""), (3L, "unseen")).toDF("doc_id", "text"),
      "doc_id", "text", merges)
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // lowest: e+s -> es+t -> est+</w> -> l+o -> lo+w => "low est</w>";
    // low: l+o, lo+w, w+</w> never learned => "low </w>"
    assert(out(1L) === (4L, "low est</w> low </w>"))
    assert(out(2L) === (0L, ""))
    // unseen word falls back to characters (plus learned e-merges if any)
    assert(out(3L) === (7L, "u n s e e n </w>"))
  }

  test("encode refuses a merge table that crosses word boundaries") {
    // both the exact marker and a marker-bearing lhs are rejected
    for (lhs <- Seq("</w>", "t</w>")) {
      val bad = Seq((1, lhs, "x")).toDF("rank", "lhs", "rhs")
      intercept[IllegalArgumentException] {
        Bpe.encode(Seq((1L, "a")).toDF("doc_id", "text"), "doc_id", "text", bad)
      }
    }
  }

  test("a word's encoding does not depend on its neighbors") {
    val merges = Bpe.learnMerges(classicCorpus, "text", 6)
    // "newest est": the word-final pattern " est </w> " fires for BOTH
    // words — under a single-space word boundary the first match would
    // consume the second word's leading space and skip it
    val out = Bpe.encode(
      Seq((1L, "newest est"), (2L, "est newest"), (3L, "est est est"))
        .toDF("doc_id", "text"), "doc_id", "text", merges)
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) === (4L, "n ew est</w> est</w>"))
    assert(out(2L) === (4L, "est</w> n ew est</w>"))
    assert(out(3L) === (3L, "est</w> est</w> est</w>"))
  }

  test("encode handles a full-depth merge table (MaxMerges chained replaces)") {
    import spark.implicits._
    // patterns that never match — this pins the plan depth the cap
    // advertises (one nested Replace per merge), not the semantics
    val deep = (1 to Bpe.MaxMerges).map(i => (i, s"x$i", s"y$i"))
      .toDF("rank", "lhs", "rhs")
    val out = Bpe.encode(Seq((1L, "plain words")).toDF("doc_id", "text"),
      "doc_id", "text", deep).as[(Long, Long, String)].collect()
    assert(out === Array((1L, 12L, "p l a i n </w> w o r d s </w>")))
  }

  test("decode inverts encode for ANY merge table (round trip to the " +
      "tokenized text); empty and null docs decode to ''") {
    val docs = Seq(
      (1L, "The  Quick   brown fox"), // case + whitespace normalize
      (2L, "aaaa aa a"),              // heavy in-word merging
      (3L, ""), (4L, null: String))
      .toDF("doc_id", "text")
    def roundtrip(merges: org.apache.spark.sql.DataFrame) =
      Bpe.decode(Bpe.encode(docs, "doc_id", "text", merges))
        .orderBy("id").as[(Long, String)].collect()
    val expected = Array((1L, "the quick brown fox"), (2L, "aaaa aa a"),
      (3L, ""), (4L, ""))
    // learned table, empty table, and a hand-built adversarial table:
    // decode must not depend on WHICH merges encode applied
    assert(roundtrip(Bpe.learnMerges(docs, "text", 20)) === expected)
    assert(roundtrip(Seq.empty[(Int, String, String, Long)]
      .toDF("rank", "lhs", "rhs", "pair_cnt")) === expected)
    assert(roundtrip(Seq((1, "a", "a", 1L), (2, "aa", "a</w>", 1L),
        (3, "t", "h", 1L))
      .toDF("rank", "lhs", "rhs", "pair_cnt")) === expected)
  }

  test("encode rejects text containing the literal marker (decode " +
      "could not invert it) — row-local fail-fast, any case") {
    val empty = Seq.empty[(Int, String, String)].toDF("rank", "lhs", "rhs")
    for (t <- Seq("discussing the </w> token", "upper </W> too")) {
      val ex = intercept[Exception] {
        Bpe.encode(Seq((1L, t)).toDF("doc_id", "text"),
          "doc_id", "text", empty).collect()
      }
      assert(ex.getMessage.contains("</w>") ||
        Option(ex.getCause).exists(_.getMessage.contains("</w>")))
    }
    // marker-free text still encodes — the guard is surgical
    assert(Bpe.encode(Seq((1L, "plain < / w > text")).toDF("doc_id", "text"),
      "doc_id", "text", empty).count() === 1L)
  }
}
