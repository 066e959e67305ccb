package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QualityModelsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // A tiny corpus where "the cat sat" is the dominant pattern: its
  // transitions are frequent AND conditionally likely; doc 5's shuffled
  // tokens form transitions seen nowhere else.
  private val corpus = docs(
    1L -> "the cat sat on the mat",
    2L -> "the cat sat on the rug",
    3L -> "the cat sat quietly",
    4L -> "the dog sat on the mat",
    5L -> "mat the on sat cat quietly the",
    6L -> "solo",
    7L -> "")

  test("bigramFluency: plausible transitions score high, noise scores zero") {
    val out = QualityModels
      .bigramFluency(corpus, "doc_id", "text", minCount = 2L, ratioDen = 4L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 1: 5 bigrams; "the cat"(3x), "cat sat"(3x), "sat on"(3x),
    // "on the"(3x), "the mat"(2x) — all repeated and conditionally
    // dominant at ratioDen=4.
    assert(out(1L)._1 === 5L)
    assert(out(1L)._3 > 0.5)
    // doc 5's reversed transitions occur once each -> below minCount.
    assert(out(5L) === ((6L, 0L, 0.0)))
    // short and empty docs: no transitions, fluency 0.
    assert(out(6L) === ((0L, 0L, 0.0)))
    assert(out(7L) === ((0L, 0L, 0.0)))
  }

  test("bigramFluency: fluency is n_fluent / n_bigrams exactly") {
    QualityModels
      .bigramFluency(corpus, "doc_id", "text", minCount = 2L, ratioDen = 100L)
      .collect().foreach { r =>
        val (nb, nf, fl) = (r.getLong(1), r.getLong(2), r.getDouble(3))
        if (nb == 0L) assert(fl === 0.0)
        else assert(fl === nf.toDouble / nb.toDouble)
        assert(nf <= nb)
      }
  }

  // Pool of target-like and off-target docs; the target slice speaks
  // "spark sql" while the off-target docs speak "lorem ipsum".
  private val pool = docs(
    10L -> "spark sql window functions",
    11L -> "spark sql join strategies",
    12L -> "lorem ipsum dolor sit amet",
    13L -> "lorem ipsum dolor sit",
    14L -> "spark sql window join")
  private val target = docs(
    90L -> "spark sql window query",
    91L -> "spark sql join query")

  test("importanceScore: target-aligned docs outrank off-target docs") {
    val scores = QualityModels
      .importanceScore(pool, target, "doc_id", "text", numFeatures = 1024)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(scores.size === 5)
    val sparkDocs = Seq(10L, 11L, 14L).map(scores)
    val loremDocs = Seq(12L, 13L).map(scores)
    assert(sparkDocs.min > loremDocs.max)
  }

  test("importanceScore: masses are exact integer feature-count sums") {
    val out = QualityModels
      .importanceScore(pool, target, "doc_id", "text", numFeatures = 1024)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 10: 4 tokens + 3 bigrams = 7 features.
    assert(out(10L)._1 === 7L)
    // raw_mass >= n_features (every feature occurs at least once in the
    // pool: the doc itself contributes it).
    out.values.foreach { case (nf, _, rm) => assert(rm >= nf) }
  }

  test("importanceScore: zero-token docs score 0.0 and survive") {
    val withEmpty = pool.union(docs(99L -> ""))
    val out = QualityModels
      .importanceScore(withEmpty, target, "doc_id", "text", 1024)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(4)))).toMap
    assert(out(99L) === ((0L, 0.0)))
  }

  test("importanceSelect: top-n by score with deterministic id tie-break") {
    val sel = QualityModels
      .importanceSelect(pool, target, "doc_id", "text", 1024, n = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(sel.length === 3)
    assert(sel.map(_._3).toSeq === Seq(1, 2, 3))
    // the selected slice is the spark-speaking docs
    assert(sel.map(_._1).toSet === Set(10L, 11L, 14L))
    // ranks follow score desc
    assert(sel.sortBy(_._3).map(_._2).reverse.sorted.reverse ===
      sel.sortBy(_._3).map(_._2))
  }

  test("importanceScore: guards reject unbroadcastable feature spaces") {
    intercept[IllegalArgumentException] {
      QualityModels.importanceScore(pool, target, "doc_id", "text",
        numFeatures = (1 << 20) + 1)
    }
    intercept[IllegalArgumentException] {
      QualityModels.importanceScore(pool, docs(), "doc_id", "text", 1024)
    }
  }
}
