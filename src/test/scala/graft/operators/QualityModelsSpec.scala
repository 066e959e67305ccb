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

  // ---------------------------------------------- perceptron classifier

  private def prose(i: Long) =
    (i, s"the cat and the dog sat in a house of it and you see that " +
      s"view number $i is a fine one to hold")
  private def spam(i: Long) =
    (i, s"buy cheap watch$i deal sale discount offer code item$i stock " +
      s"price click market brand shop order unit$i")

  test("perceptron separates stopword prose from keyword spam") {
    import spark.implicits._
    val train = ((0L to 19L by 2).map(prose) ++ (1L to 19L by 2).map(spam))
      .toDF("doc_id", "text")
    val feats = QualityModels.classifierFeatures(train, "doc_id", "text")
      .withColumn("label",
        when(col("id") % 2 === 0, 1L).otherwise(-1L))
    val w = QualityModels.trainPerceptron(feats, "label", iters = 8)
    // held-out docs of each shape classify correctly
    val test = Seq(prose(100L), spam(101L)).toDF("doc_id", "text")
    val m = QualityModels.perceptronMargin(w.toSeq)
    val preds = QualityModels.classifierFeatures(test, "doc_id", "text")
      .select(col("id"), (m > 0).as("pred"))
      .as[(Long, Boolean)].collect().toMap
    assert(preds(100L) && !preds(101L))
  }

  test("perceptronQuality minQuality=1.0 IS the trained decision boundary") {
    import spark.implicits._
    val train = ((0L to 19L by 2).map(prose) ++ (1L to 19L by 2).map(spam))
      .toDF("doc_id", "text")
    val feats = QualityModels.classifierFeatures(train, "doc_id", "text")
      .withColumn("label",
        when(col("id") % 2 === 0, 1L).otherwise(-1L))
    val w = QualityModels.trainPerceptron(feats, "label", iters = 8)
    // the CURATE-STAGE adapter on held-out docs: the calibrated gate is
    // score ≥ 1.0 — with integer margins that is exactly margin > 0,
    // the classifier's own boundary, so the gate keeps held-out prose
    // and drops held-out spam with no separately-tuned threshold
    val q = QualityModels.perceptronQuality(w.toSeq)
    val held = Seq(prose(200L), spam(201L), prose(202L), spam(203L))
      .toDF("doc_id", "text")
      .withColumn("__toks",
        graft.functions.TextFunctions.tokens(col("text")))
    val scored = held
      .select(col("doc_id"), q(col("text"), col("__toks")).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(scored(200L) >= 1.0 && scored(202L) >= 1.0)
    assert(scored(201L) < 1.0 && scored(203L) < 1.0)
    // the adapter's score equals the raw training margin exactly — one
    // shared feature definition, no train/serve drift
    val m = QualityModels.perceptronMargin(w.toSeq)
    val margins = QualityModels.classifierFeatures(held, "doc_id", "text")
      .select(col("id"), m.cast("double").as("m"))
      .as[(Long, Double)].collect().toMap
    assert(scored === margins)
  }

  test("calibrateThreshold recovers a gate the raw 0-boundary misses") {
    import spark.implicits._
    // every score positive (the arm-B profile shape: perfect ranking,
    // all margins one side of zero) — the 0-gate accepts everything,
    // the calibrated gate separates exactly
    val scored = ((1 to 50).map(i => (90.0 + i % 10, -1L)) ++
      (1 to 50).map(i => (101.0 + i % 10, 1L))).toDF("s", "label")
    val (tau, trainAcc) = QualityModels.calibrateThreshold(
      scored, "s", "label", bins = 4096)
    assert(trainAcc === 1.0)
    assert(tau > 99.0 && tau <= 101.0,
      s"calibrated gate must split the classes, got $tau")
    // the 0-gate is useless here: every row passes
    assert(scored.filter(col("s") >= 1.0).count() === 100L)
    // degenerate single-score set: τ is finite, accuracy = class share
    val one = Seq((5.0, 1L), (5.0, -1L), (5.0, 1L)).toDF("s", "label")
    val (t1, a1) = QualityModels.calibrateThreshold(one, "s", "label")
    assert(a1 >= 2.0 / 3 - 1e-9 && !t1.isNaN)
    intercept[IllegalArgumentException] {
      QualityModels.calibrateThreshold(one.limit(0), "s", "label")
    }
    // a null LABEL fails fast instead of silently counting as a
    // negative (which would skew totNeg and the calibrated τ)
    val withNull = Seq((Some(5.0), Some(1L)), (Some(6.0), None),
      (Some(4.0), Some(-1L))).toDF("s", "label")
    val e = intercept[Exception] {
      QualityModels.calibrateThreshold(withNull, "s", "label")
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("null label") ||
        Option(e.getCause).exists(_.getMessage.contains("null label"))))
  }

  test("perceptron training is partition-order independent (exact integers)") {
    import spark.implicits._
    val rows = (0L until 40L).map(i => if (i % 2 == 0) prose(i) else spam(i))
    val feats1 = QualityModels.classifierFeatures(
      rows.toDF("doc_id", "text").repartition(1), "doc_id", "text")
      .withColumn("label", when(col("id") % 2 === 0, 1L).otherwise(-1L))
    val feats2 = QualityModels.classifierFeatures(
      rows.reverse.toDF("doc_id", "text").repartition(13), "doc_id", "text")
      .withColumn("label", when(col("id") % 2 === 0, 1L).otherwise(-1L))
    val w1 = QualityModels.trainPerceptron(feats1, "label", iters = 5)
    val w2 = QualityModels.trainPerceptron(feats2, "label", iters = 5)
    assert(w1.toSeq === w2.toSeq)
  }

  test("classifier features: null text is the empty doc, caps hold") {
    import spark.implicits._
    val f = QualityModels.classifierFeatures(
      Seq((1L, null.asInstanceOf[String]),
        (2L, ("word " * 3000) + ("9" * 3000) + "x" * 200))
        .toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (1 until 7).map(r.getLong).toSeq).toMap
    assert(f(1L) === Seq(1L, 0L, 0L, 0L, 0L, 0L))
    // token count / digit count capped at 1024, max token length at 64
    assert(f(2L)(1) === 1024L && f(2L)(3) === 1024L && f(2L)(5) === 64L)
  }

  test("hashed perceptron learns the words themselves, scores held-out docs") {
    import spark.implicits._
    val train = ((0L to 39L by 2).map(prose) ++ (1L to 39L by 2).map(spam))
      .toDF("doc_id", "text")
      .withColumn("label", when(col("doc_id") % 2 === 0, 1L).otherwise(-1L))
    val w = QualityModels.trainHashedPerceptron(train, "doc_id", "text",
      "label", numFeatures = 1024, iters = 6)
    val test = Seq(prose(100L), spam(101L), (102L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val m = QualityModels.hashedMargin(test, "doc_id", "text", w)
      .as[(Long, Long)].collect().toMap
    assert(m(100L) > 0 && m(101L) <= 0)
    assert(m(102L) === 0L) // tokenless doc: zero margin, survives
  }

  test("hashed perceptron: distributed iterations ≡ driver replay") {
    import spark.implicits._
    // maxDriverOcc = 0 forces the distributed iterations; the default
    // replays small occurrence streams on the driver — identical weights
    val rows = (0L until 40L).map(i => if (i % 3 == 0) prose(i) else spam(i))
    val df = rows.toDF("doc_id", "text").withColumn("label",
      when(col("doc_id") % 3 === 0, 1L).otherwise(-1L))
    val driver = QualityModels.trainHashedPerceptron(
      df, "doc_id", "text", "label", numFeatures = 512, iters = 5)
    val dist = QualityModels.trainHashedPerceptron(
      df, "doc_id", "text", "label", numFeatures = 512, iters = 5,
      maxDriverOcc = 0)
    assert(driver.toSeq === dist.toSeq)
  }

  test("hashed perceptron training is partition-order independent") {
    import spark.implicits._
    val rows = (0L until 30L).map(i => if (i % 2 == 0) prose(i) else spam(i))
    def weights(df: org.apache.spark.sql.DataFrame) =
      QualityModels.trainHashedPerceptron(
        df.withColumn("label",
          when(col("doc_id") % 2 === 0, 1L).otherwise(-1L)),
        "doc_id", "text", "label", numFeatures = 512, iters = 4)
    val w1 = weights(rows.toDF("doc_id", "text").repartition(1))
    val w2 = weights(rows.reverse.toDF("doc_id", "text").repartition(11))
    assert(w1.toSeq === w2.toSeq)
  }

  test("hashed perceptron guards: feature space and iteration bounds") {
    import spark.implicits._
    val df = Seq(prose(1L)).toDF("doc_id", "text")
      .withColumn("label", lit(1L))
    intercept[IllegalArgumentException] {
      QualityModels.trainHashedPerceptron(df, "doc_id", "text", "label",
        numFeatures = (1 << 20) + 1, iters = 2)
    }
    intercept[IllegalArgumentException] {
      QualityModels.trainHashedPerceptron(df, "doc_id", "text", "label",
        numFeatures = 64, iters = 0)
    }
    intercept[IllegalArgumentException] {
      QualityModels.trainHashedPerceptron(
        df.filter(col("doc_id") < 0), "doc_id", "text", "label",
        numFeatures = 64, iters = 2)
    }
  }

  test("weights round-trip through parquet; corrupt files refuse to load") {
    import spark.implicits._
    val train = ((0L to 19L by 2).map(prose) ++ (1L to 19L by 2).map(spam))
      .toDF("doc_id", "text")
      .withColumn("label", when(col("doc_id") % 2 === 0, 1L).otherwise(-1L))
    val w = QualityModels.trainHashedPerceptron(train, "doc_id", "text",
      "label", numFeatures = 128, iters = 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_wts_").toString
    QualityModels.saveWeights(spark, s"$dir/m", w)
    val back = QualityModels.loadWeights(spark, s"$dir/m")
    assert(back.toSeq === w.toSeq)
    // margins from the loaded model are the margins from the live one
    val test = Seq(prose(100L), spam(101L)).toDF("doc_id", "text")
    assert(
      QualityModels.hashedMargin(test, "doc_id", "text", back)
        .as[(Long, Long)].collect().toMap ===
      QualityModels.hashedMargin(test, "doc_id", "text", w)
        .as[(Long, Long)].collect().toMap)
    // a gap in the index space is corruption, not a sparse model
    Seq((0L, 5L), (2L, 7L)).toDF("f", "w")
      .write.mode("overwrite").parquet(s"$dir/bad")
    intercept[IllegalArgumentException] {
      QualityModels.loadWeights(spark, s"$dir/bad")
    }
  }

  test("perceptron guards: empty training set and oversized sets refuse") {
    import spark.implicits._
    val empty = QualityModels.classifierFeatures(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text")
      .withColumn("label", lit(1L))
    intercept[IllegalArgumentException] {
      QualityModels.trainPerceptron(empty, "label", iters = 2)
    }
    intercept[IllegalArgumentException] {
      QualityModels.trainPerceptron(empty, "label", iters = 0)
    }
  }
}
