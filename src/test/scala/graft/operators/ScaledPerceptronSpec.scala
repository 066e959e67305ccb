package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the scaled dense trainer's envelope on arm-A-shaped data
  * (suffix-delta signals): the unscaled batch perceptron oscillates or
  * inverts, the power-of-two up-scaled form separates — the measured
  * claims in [[QualityModels.trainPerceptronScaled]]'s scaladoc. */
class ScaledPerceptronSpec extends SparkSpec {
  import spark.implicits._

  private val stop10 = "the of and to in that it is was for"
  private def digits(seed: Long) =
    (0 until 10).map(i => (seed * 31 + i * 7919) % 100000).mkString(" ")

  private def auc(scored: Seq[(Double, Long)]): Double = {
    val pos = scored.filter(_._2 == 1L).map(_._1)
    val neg = scored.filter(_._2 == -1L).map(_._1)
    val u = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    u / (pos.size.toDouble * neg.size)
  }

  private def runArm(tag: String, base: Long => String): (Double, Double) = {
    val docs = (0L until 400L).map { i =>
      val pos = i % 2 == 0
      val text = base(i) + " " + (if (pos) stop10 else digits(i))
      (i, text, if (pos) 1L else -1L)
    }.toDF("doc_id", "text", "label")
    val train = docs.filter(col("doc_id") % 4 === 0).localCheckpoint(true)
    val held = docs.filter(col("doc_id") % 4 =!= 0)
    def feats(d: org.apache.spark.sql.DataFrame) =
      QualityModels.classifierFeatures(d, "doc_id", "text")
        .join(d.select(col("doc_id").as("id"), col("label")), Seq("id"))
    val trainF = feats(train).localCheckpoint(true)
    def score(w: Array[Long]) = feats(held)
      .select(QualityModels.perceptronMargin(w.toSeq)
        .cast("double").as("s"), col("label"))
      .as[(Double, Long)].collect().toSeq
    val plain = auc(score(
      QualityModels.trainPerceptron(trainF, "label", iters = 8)))
    val scaled = auc(score(
      QualityModels.trainPerceptronScaled(trainF, "label", iters = 8)))
    info(f"$tag%-16s plain-AUC=$plain%.4f scaled-AUC=$scaled%.4f")
    (plain, scaled)
  }

  test("suffix-delta arms: scaled trainer vs plain") {
    // uniform base: every doc shares one body — the homogeneous-corpus
    // delta case
    val body = ((0 until 60).map(i => s"word$i") ++
      (0 until 40).map(i => s"${i * 137}")).mkString(" ")
    val (pU, sU) = runArm("uniform-base", _ => body)
    // varying base: per-doc lengths differ 3x — the cross-doc-variance
    // case the scaladoc calls out as hashed-trainer territory
    val (pV, sV) = runArm("varying-base", { i =>
      val len = 40 + (i * 13 % 80).toInt
      ((0 until len).map(j => s"w${(i + j) % 50}") ++
        (0 until len / 2).map(j => s"${j * 91 + i}")).mkString(" ")
    })
    info(f"uniform: plain=$pU%.3f scaled=$sU%.3f | varying: plain=$pV%.3f scaled=$sV%.3f")
    assert(sU >= 0.99, s"uniform-base scaled AUC must separate, got $sU")
    assert(sV >= 0.95, s"varying-base scaled AUC must rank, got $sV")
    // the plain trainer's documented failure on this shape — if this
    // ever starts passing, the probe boundary note needs revisiting
    assert(pU <= 0.6 && pV <= 0.6,
      s"unscaled trainer unexpectedly separates ($pU / $pV)")
  }

  test("scaled weights score raw features: fold-back identity") {
    import spark.implicits._
    val docs = (0L until 80L).map(i =>
      (i, s"some words ${i % 7} and digits ${i * 13}",
        if (i % 2 == 0) 1L else -1L)).toDF("doc_id", "text", "label")
    val f = QualityModels.classifierFeatures(docs, "doc_id", "text")
      .join(docs.select(col("doc_id").as("id"), col("label")), Seq("id"))
      .localCheckpoint(true)
    val w = QualityModels.trainPerceptronScaled(f, "label", iters = 3)
    // the returned weights are RAW-space: persisting and re-loading
    // them scores through the unchanged perceptronMargin surface
    val dir = java.nio.file.Files.createTempDirectory("spw_").toString
    QualityModels.saveWeights(spark, s"$dir/w", w)
    val w2 = QualityModels.loadWeights(spark, s"$dir/w")
    assert(w.toSeq === w2.toSeq)
    val m1 = f.select(col("id"),
        QualityModels.perceptronMargin(w.toSeq).as("m"))
      .as[(Long, Long)].collect().toMap
    val m2 = f.select(col("id"),
        QualityModels.perceptronMargin(w2.toSeq).as("m"))
      .as[(Long, Long)].collect().toMap
    assert(m1 === m2)
  }
}
