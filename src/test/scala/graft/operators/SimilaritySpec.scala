package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // tiny corpus with planted structure: 1≈2, 3 orthogonal-ish, 4 = -1
  private def corpus = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.1f)),
    (2L, Array(0.9f, 0.1f, 0.0f, 0.1f)),
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f, -0.1f)),
    (5L, Array(0.0f, 0.0f, 1.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK matches a direct Scala computation") {
    val out = Similarity.bruteForceTopK(corpus,
        corpus.filter(col("vec_id") === 1), "vec_id", "embedding", 2)
      .select("nbr_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(out.map(_._1).toSeq === Seq(2L, 3L),
      "nearest is the near-duplicate, then the slightly-positive axis")
  }

  test("bruteForceTopK refuses oversized query sets") {
    intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(corpus, corpus, "vec_id", "embedding", 2,
        maxQueries = 3)
    }
  }

  test("lshTopK recalls the planted near-duplicate") {
    val out = Similarity.lshTopK(corpus, corpus.filter(col("vec_id") === 1),
        "vec_id", "embedding", k = 2, dim = 4, tables = 8, bitsPerTable = 2)
      .select("nbr_id").as[Long].collect().toSet
    assert(out.contains(2L), "the 0.99-cosine neighbor must be recalled")
  }

  test("semanticDedup keeps one representative per cluster and all singletons") {
    // chain 1≈2≈6 into ONE cluster via the transitive 2≈6 edge — only the
    // min id (1) survives; 3, 4, 5 are in no pair and pass through
    val chained = corpus.union(Seq(
      (6L, Array(0.8f, 0.2f, 0.0f, 0.1f))).toDF("vec_id", "embedding"))
    val kept = Similarity.semanticDedup(chained, "vec_id", "embedding",
        threshold = 0.9, dim = 4, tables = 8, bitsPerTable = 2)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 3L, 4L, 5L))
    // threshold above every cosine → nothing clusters, corpus unchanged
    val all = Similarity.semanticDedup(chained, "vec_id", "embedding",
        threshold = 0.9999, dim = 4, tables = 8, bitsPerTable = 2)
      .count()
    assert(all === 6L)
  }

  test("labelBlockedNearDup caps hot labels (bounded pair count)") {
    // one hot label with 20 identical vectors: uncapped all-pairs would
    // emit 190 pairs; cap 5 bounds it to C(5,2) = 10 from the 5 lowest ids
    val hot = (1L to 20L).map(i => ("en", i, Array(1.0f, 0.0f)))
    val cold = Seq(("de", 100L, Array(0.0f, 1.0f)), ("de", 101L, Array(0.0f, 1.0f)))
    val df = (hot ++ cold).toDF("label", "vec_id", "embedding")
    val out = Similarity.labelBlockedNearDup(df, "label", "vec_id",
        "embedding", threshold = 0.9, maxBlock = 5)
      .select("label", "id_a", "id_b").as[(String, Long, Long)].collect()
    assert(out.count(_._1 == "en") === 10, "hot block capped at C(5,2)")
    assert(out.filter(_._1 == "en").forall(p => p._2 <= 5 && p._3 <= 5),
      "cap keeps the first maxBlock members by id — deterministic")
    assert(out.count(_._1 == "de") === 1, "small blocks unaffected")
  }

  test("ivfTopKAssigned over a cell-bucketed warehouse table matches inline IVF") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    val wh = new graft.sources.Warehouse(spark, root)
    val cents = Similarity.centroidsDF(spark, Seq(
      0 -> Seq(1.0, 0.0, 0.0, 0.0), 1 -> Seq(0.0, 1.0, 0.0, 0.0)))
    val queries = corpus.filter(col("vec_id") === 1)
    val inline = Similarity.ivfTopK(corpus, queries,
      "vec_id", "embedding", 2, cents, nProbes = 2)
      .as[(Long, Long, Double, Int)].collect().toSet
    // build once: assign cells, persist bucketed by cell, serve from it
    wh.appendBucketed("ivf_corpus",
      Similarity.assignCells(corpus, "vec_id", "embedding", cents),
      Seq("cell"), 2)
    val served = Similarity.ivfTopKAssigned(wh.readBucketed("ivf_corpus"),
      queries, "vec_id", "embedding", 2, cents, nProbes = 2)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(served === inline,
      "bucketed-table serving returns the same neighbors as inline IVF")
  }

  test("ivfTopK with trained centroids matches brute force on probes") {
    val cents = Similarity.centroidsDF(spark,
      Similarity.trainCentroids(corpus, "embedding", kCells = 3, sampleN = 10))
    val ivf = Similarity.ivfTopK(corpus, corpus.filter(col("vec_id") === 1),
        "vec_id", "embedding", k = 1, cents, nProbes = 3)
      .select("nbr_id").as[Long].head()
    assert(ivf === 2L, "probing all cells recovers the exact neighbor")
  }

  test("referenceSimilarity scores cosine to the exact reference mean") {
    // reference = {(2,0), (4,0)} → centroid (3,0); probes along axes
    val ref = Seq((1L, Array(2f, 0f)), (2L, Array(4f, 0f))).toDF("id", "v")
    val cent = Similarity.referenceCentroid(ref, "id", "v")
    assert(cent === Seq(3.0, 0.0))
    val docs = Seq((10L, Array(5f, 0f)), (11L, Array(0f, 7f)),
      (12L, Array(3f, 3f)), (13L, Array(0f, 0f))).toDF("id", "v")
    val out = Similarity.referenceSimilarity(docs, "id", "v", cent)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(out(0) === ((10L, 1.0)))            // parallel to centroid
    assert(out(1) === ((11L, 0.0)))            // orthogonal
    assert(math.abs(out(2)._2 - 1.0 / math.sqrt(2.0)) < 1e-12) // 45°
    assert(out(3) === ((13L, 0.0)))            // zero vector guard
  }

  test("referenceCentroid is partitioning-independent (fixed fold order)") {
    val ref = (1L to 100L).map(i =>
      (i, Array.tabulate(4)(j => (math.sin(i * 3 + j) * 0.1).toFloat)))
      .toDF("id", "v")
    val a = Similarity.referenceCentroid(ref, "id", "v")
    val b = Similarity.referenceCentroid(ref.repartition(13), "id", "v")
    assert(a === b) // bit-equal despite different partitionings
  }
}
