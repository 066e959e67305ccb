package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int) = (0L until n.toLong).map { i =>
    (i, Array.tabulate(8)(j => (math.sin(i * 3 + j) * (1 + i % 5)).toFloat))
  }.toDF("vec_id", "embedding")

  test("quantizeInt8: reconstruction error bounded by half a step") {
    val rows = Quantization.quantizeInt8(vecs(40), "vec_id", "embedding")
      .join(vecs(40), col("id") === col("vec_id"))
      .select("embedding", "scale", "qvec")
      .as[(Array[Float], Double, Seq[Byte])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (x, scale, q) =>
      assert(q.length === x.length)
      x.zip(q).foreach { case (xi, qi) =>
        assert(math.abs(xi - qi * scale) <= scale / 2 + 1e-12,
          s"$xi vs ${qi * scale} at scale $scale")
        assert(qi >= -127 && qi <= 127)
      }
    }
  }

  test("quantizeInt8: all-zero vector gets scale 0 and a zero code") {
    val z = Seq((1L, Array(0f, 0f, 0f))).toDF("vec_id", "embedding")
    val (scale, q) = Quantization.quantizeInt8(z, "vec_id", "embedding")
      .select("scale", "qvec").as[(Double, Seq[Byte])].head()
    assert(scale === 0.0 && q.toSeq === Seq(0, 0, 0))
  }

  test("int8TopK with a full-width rescore window equals brute force") {
    val corpus = vecs(60)
    val queries = corpus.filter(col("vec_id") < 5)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "nbr_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    val brute = key(Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", 4))
    // rescore window spans the whole corpus → the exact top-k MUST appear
    val quant = key(Quantization.int8TopK(corpus, queries,
      "vec_id", "embedding", 4, rescoreFactor = 15))
    assert(quant === brute)
    // exact sims survive too (rescoring reports exact cosine)
    val bs = Similarity.bruteForceTopK(corpus, queries,
        "vec_id", "embedding", 4)
      .select("query_id", "nbr_id", "sim")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    Quantization.int8TopK(corpus, queries, "vec_id", "embedding", 4,
        rescoreFactor = 15)
      .select("query_id", "nbr_id", "sim")
      .as[(Long, Long, Double)].collect()
      .foreach { case (q, n, s) => assert(bs((q, n)) === s) }
  }

  test("int8TopK: narrow rescore window still returns k exact-scored rows") {
    val corpus = vecs(60)
    val queries = corpus.filter(col("vec_id") === 0)
    val out = Quantization.int8TopK(corpus, queries, "vec_id", "embedding",
        k = 3, rescoreFactor = 1)
      .select("nbr_id", "sim").as[(Long, Double)].collect()
    assert(out.length === 3)
    assert(out.forall { case (_, s) => s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9 })
  }

  test("native-double scoring is bit-equal to the integer specification") {
    val q = Quantization.quantizeInt8(vecs(30), "vec_id", "embedding")
    val pairs = q.select(col("id").as("ia"), col("qvec").as("qa"))
      .crossJoin(q.select(col("id").as("ib"), col("qvec").as("qb")))
      .filter(col("ia") < col("ib"))
    val viaInt = pairs.select(col("ia"), col("ib"),
        Quantization.intCosine(col("qa"), col("qb")).as("c"))
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    import graft.functions.VectorFunctions.{cosineFromParts, dot, norm}
    val viaDouble = pairs.select(col("ia"), col("ib"),
        cosineFromParts(
          dot(col("qa").cast("array<double>"), col("qb").cast("array<double>")),
          norm(col("qa").cast("array<double>")),
          norm(col("qb").cast("array<double>"))).as("c"))
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(viaInt.nonEmpty && viaInt === viaDouble)
  }

  test("AdcDot kernel: fold order, bad-code and shape null semantics") {
    import graft.functions.expressions.{AdcDot, ColumnBridge}
    import org.apache.spark.sql.Column
    def adc(code: Column, tab: Column, ksub: Int): Column =
      ColumnBridge.column(AdcDot(ColumnBridge.expression(code),
        ColumnBridge.expression(tab), ksub))
    val df = Seq(
      (1L, Seq(1.toByte, 0.toByte), Seq(10.0, 20.0, 30.0, 40.0)),  // 20+30
      (2L, Seq(1.toByte, 5.toByte), Seq(10.0, 20.0, 30.0, 40.0)),  // code ≥ ksub
      (3L, Seq(1.toByte, 0.toByte), Seq(10.0, 20.0, 30.0))         // short table
    ).toDF("id", "code", "tab")
    val out = df.select(col("id"), adc(col("code"), col("tab"), 2).as("v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L) === Some(50.0))
    assert(out(2L) === None && out(3L) === None)
  }

  test("pqEncode: m-byte codes; a training vector encodes to its own cell") {
    val v = vecs(32)
    val books = Quantization.pqTrain(v, "vec_id", "embedding",
      dim = 8, m = 4, ksub = 4, iters = 0)
    assert(books.size === 4 && books.forall(_.size === 4))
    val codes = Quantization.pqEncode(v, "vec_id", "embedding", books)
      .as[(Long, Seq[Byte])].collect().toMap
    assert(codes.size === 32)
    assert(codes.values.forall(c => c.length === 4 && c.forall(b => b >= 0 && b < 4)))
    // iters=0 codebook = the 4 smallest-id sub-vectors verbatim, so
    // every slice of vector 2 is its own centroid: code = (2,2,2,2)
    assert(codes(2L) === Seq[Byte](2, 2, 2, 2))
  }

  test("pqTopK with a full-width rescore window equals brute force") {
    val corpus = vecs(60)
    val queries = corpus.filter(col("vec_id") < 4)
    val books = Quantization.pqTrain(corpus, "vec_id", "embedding",
      dim = 8, m = 4, ksub = 8, iters = 2)
    val brute = Similarity.bruteForceTopK(corpus, queries,
        "vec_id", "embedding", 3)
      .select("query_id", "nbr_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val pq = Quantization.pqTopK(corpus, queries, "vec_id", "embedding",
        3, books, rescoreFactor = 20)
      .select("query_id", "nbr_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(pq === brute)
  }

  test("pqTopKEncoded serves from persisted codes") {
    val corpus = vecs(40)
    val queries = corpus.filter(col("vec_id") === 7)
    val books = Quantization.pqTrain(corpus, "vec_id", "embedding",
      dim = 8, m = 2, ksub = 8, iters = 1)
    val codes = Quantization.pqEncode(corpus, "vec_id", "embedding", books)
    val out = Quantization.pqTopKEncoded(codes, corpus, queries,
        "vec_id", "embedding", 5, books, rescoreFactor = 10)
      .select("nbr_id", "sim", "rank").as[(Long, Double, Int)].collect()
    assert(out.length === 5 && out.map(_._3).sorted.toSeq === Seq(1, 2, 3, 4, 5))
    assert(out.forall { case (n, s, _) => n != 7L && s <= 1.0 + 1e-9 })
  }

  test("residuals subtract the assigned coarse centroid exactly") {
    val v = vecs(20)
    val cents = Clustering.kmeans(v, "vec_id", "embedding", k = 4, iters = 1)
    val cmap = cents.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    val full = v.as[(Long, Array[Float])].collect().toMap
    Quantization.residuals(v, "vec_id", "embedding", cents)
      .as[(Long, Int, Array[Double])].collect().foreach { case (id, cell, r) =>
        val expect = full(id).map(_.toDouble).zip(cmap(cell)).map(t => t._1 - t._2)
        assert(r.toSeq === expect.toSeq)
      }
  }

  test("ivfAdcTopKEncoded: probing every cell with a wide window equals brute") {
    val corpus = vecs(60)
    val queries = corpus.filter(col("vec_id") < 4)
    val cents = Clustering.kmeans(corpus, "vec_id", "embedding",
      k = 4, iters = 1)
    val books = Quantization.pqTrain(
      Quantization.residuals(corpus, "vec_id", "embedding", cents),
      "id", "rvec", dim = 8, m = 4, ksub = 8, iters = 1)
    val codes = Quantization.pqEncodeResidual(
      corpus, "vec_id", "embedding", cents, books)
    val brute = Similarity.bruteForceTopK(corpus, queries,
        "vec_id", "embedding", 3)
      .select("query_id", "nbr_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val adc = Quantization.ivfAdcTopKEncoded(codes, corpus, queries,
        "vec_id", "embedding", 3, cents, books,
        nProbes = 4, rescoreFactor = 20)
      .select("query_id", "nbr_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(adc === brute)
  }

  test("residual codes rank a planted near-dup first at a narrow window") {
    // clustered corpus + one planted near-dup of query 0: the residual
    // code must put the dup at the top of the approx order even with
    // rescoreFactor = 1 (raw-vector codes at this budget need not)
    val base = vecs(50)
    val dup = base.filter(col("vec_id") === 0)
      .select(lit(999L).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.001f)).as("embedding"))
    val corpus = base.unionByName(dup)
    val queries = base.filter(col("vec_id") === 0)
    val cents = Clustering.kmeans(corpus, "vec_id", "embedding",
      k = 4, iters = 2)
    val books = Quantization.pqTrain(
      Quantization.residuals(corpus, "vec_id", "embedding", cents),
      "id", "rvec", dim = 8, m = 8, ksub = 16, iters = 2)
    val codes = Quantization.pqEncodeResidual(
      corpus, "vec_id", "embedding", cents, books)
    val top = Quantization.ivfAdcTopKEncoded(codes, corpus, queries,
        "vec_id", "embedding", 1, cents, books,
        nProbes = 1, rescoreFactor = 1)
      .select("nbr_id").as[Long].collect()
    assert(top.toSeq === Seq(999L))
  }

  test("signBits packs component signs; binaryTopK full-window equals brute") {
    val v = Seq(
      (1L, Array(1.0f, -1.0f, 0.0f)),   // bits 0 and 2 (zero counts as >= 0)
      (2L, Array(-0.5f, 2.0f, -3.0f))   // bit 1
    ).toDF("vec_id", "embedding")
    val sigs = Quantization.signBits(v, "vec_id", "embedding")
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) === 5L && sigs(2L) === 2L)
    // null/empty vectors signature to NULL (never to a matchable 0L)
    val edge = Seq((1L, Option(Array(1.0f))), (2L, None),
      (3L, Option(Array.empty[Float]))).toDF("vec_id", "embedding")
    val e = Quantization.signBits(edge, "vec_id", "embedding")
      .as[(Long, Option[Long])].collect().toMap
    assert(e(1L) === Some(1L) && e(2L) === None && e(3L) === None)
    // dim > 64 fails fast instead of silently truncating
    val wide = Seq((1L, Array.fill(65)(1.0f))).toDF("vec_id", "embedding")
    intercept[Exception] {
      Quantization.signBits(wide, "vec_id", "embedding").collect()
    }

    val corpus = vecs(60)
    val queries = corpus.filter(col("vec_id") < 4)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "nbr_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    val brute = key(Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", 3))
    assert(key(Quantization.binaryTopK(corpus, queries,
      "vec_id", "embedding", 3, rescoreFactor = 20)) === brute)
    // a packed signature feeds the generic hamming pair machinery:
    // two identical vectors pair at distance 0
    val dup = corpus.filter(col("vec_id") === 7)
      .withColumn("vec_id", lit(700L))
    val pairs = Dedup.signatureNearDupPairs(
        Quantization.signBits(corpus.unionByName(dup), "vec_id", "embedding"),
        "id", "sig", maxDist = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((7L, 700L)))
  }

  test("int8TopK refuses oversized query sets") {
    val corpus = vecs(30)
    intercept[IllegalArgumentException] {
      Quantization.int8TopK(corpus, corpus, "vec_id", "embedding", 2,
        maxQueries = 5)
    }
  }

  test("IVF-PQ/IVFADC refuse oversized query sets; the partitioned " +
      "forms serve them identically to the broadcast forms") {
    val corpus = vecs(60)
    val queries = corpus.filter(col("vec_id") < 8)
    val cents = Clustering.kmeans(corpus, "vec_id", "embedding",
      k = 4, iters = 1)
    val books = Quantization.pqTrain(corpus, "vec_id", "embedding",
      dim = 8, m = 4, ksub = 8, iters = 1)
    val codes = Quantization.pqEncodeAssigned(
      corpus, "vec_id", "embedding", cents, books)
    val rbooks = Quantization.pqTrain(
      Quantization.residuals(corpus, "vec_id", "embedding", cents),
      "id", "rvec", dim = 8, m = 4, ksub = 8, iters = 1)
    val rcodes = Quantization.pqEncodeResidual(
      corpus, "vec_id", "embedding", cents, rbooks)
    // the family-standard guard, now on both broadcast forms
    intercept[IllegalArgumentException] {
      Quantization.ivfPqTopKEncoded(codes, corpus, queries, "vec_id",
        "embedding", 3, cents, books, nProbes = 2, maxQueries = 5)
    }
    intercept[IllegalArgumentException] {
      Quantization.ivfAdcTopKEncoded(rcodes, corpus, queries, "vec_id",
        "embedding", 3, cents, rbooks, nProbes = 2, maxQueries = 5)
    }
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "nbr_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    // partitioned == broadcast, including a salt that exceeds the
    // corpus-per-cell count (some salts match nothing)
    val pqB = key(Quantization.ivfPqTopKEncoded(codes, corpus, queries,
      "vec_id", "embedding", 3, cents, books, nProbes = 2))
    val pqP = key(Quantization.ivfPqTopKEncodedPartitioned(codes, corpus,
      queries, "vec_id", "embedding", 3, cents, books, nProbes = 2,
      cellSalt = 7))
    assert(pqP === pqB && pqB.nonEmpty)
    val adcB = key(Quantization.ivfAdcTopKEncoded(rcodes, corpus, queries,
      "vec_id", "embedding", 3, cents, rbooks, nProbes = 2))
    val adcP = key(Quantization.ivfAdcTopKEncodedPartitioned(rcodes, corpus,
      queries, "vec_id", "embedding", 3, cents, rbooks, nProbes = 2,
      cellSalt = 7))
    assert(adcP === adcB && adcB.nonEmpty)
  }
}
