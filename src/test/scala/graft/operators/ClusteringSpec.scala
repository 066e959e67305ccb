package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def vecs2d(rows: (Long, Seq[Double])*) =
    rows.toDF("id", "v")

  test("separated modes land in separate clusters, tight points together") {
    val df = vecs2d(
      0L -> Seq(0.0, 0.0), 1L -> Seq(0.1, 0.0), 2L -> Seq(0.0, 0.1),
      3L -> Seq(10.0, 10.0), 4L -> Seq(10.1, 10.0), 5L -> Seq(10.0, 10.1))
    val a = Clustering.kmeansAssign(df, "id", "v", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Set(a(0), a(1), a(2)).size == 1)
    assert(Set(a(3), a(4), a(5)).size == 1)
    assert(a(0) != a(3))
  }

  test("iters=0 returns the k smallest-id vectors as centroids, cell = rank") {
    val df = vecs2d(5L -> Seq(5.0, 5.0), 1L -> Seq(1.0, 1.0),
      3L -> Seq(3.0, 3.0))
    val c = Clustering.kmeansCentroids(df, "id", "v", k = 2, iters = 0)
    assert(c.map(_._1) == Seq(0, 1))
    assert(c(0)._2.toSeq == Seq(1.0, 1.0)) // id 1
    assert(c(1)._2.toSeq == Seq(3.0, 3.0)) // id 3
  }

  test("centroid update is the quantized mean (exact integer arithmetic)") {
    // one obvious cluster around the first init point; k=1 so every
    // vector contributes to cell 0's update
    val df = vecs2d(0L -> Seq(1.0, 2.0), 1L -> Seq(3.0, 4.0))
    val c = Clustering.kmeansCentroids(df, "id", "v", k = 1, iters = 1)
    val q = Clustering.Quant
    def qm(xs: Seq[Double]): Double =
      xs.map(x => math.floor(x * q).toLong).sum.toDouble / q / xs.size
    assert(c.head._2.toSeq == Seq(qm(Seq(1.0, 3.0)), qm(Seq(2.0, 4.0))))
  }

  test("empty cells keep their previous centroid") {
    // init picks ids 0 and 1; everything is closest to centroid 0 after
    // the first update, so cell 1 goes empty and must keep its centroid
    val df = vecs2d(0L -> Seq(0.0, 0.0), 1L -> Seq(0.2, 0.0),
      2L -> Seq(0.1, 0.0))
    val c2 = Clustering.kmeansCentroids(df, "id", "v", k = 2, iters = 4)
    assert(c2.size == 2) // both cells survive with defined centroids
    assert(c2.forall(_._2.length == 2))
  }

  test("null vectors neither poison init centroids nor join updates") {
    val df = Seq(
      (0L, Seq(0.0, 0.0)), (1L, null.asInstanceOf[Seq[Double]]),
      (2L, Seq(10.0, 10.0)), (3L, Seq(10.1, 10.0)))
      .toDF("id", "v")
    // id 1 (null) sits inside the k-smallest-id init window — it must
    // be skipped, so init picks ids 0 and 2
    val c = Clustering.kmeansCentroids(df, "id", "v", k = 2, iters = 2)
    assert(c.size == 2 && c.forall(_._2.forall(x => !x.isNaN)))
    val a = Clustering.kmeansAssign(df, "id", "v", 2, 2)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1)))
      .toMap
    assert(a(1L) == -1) // null vector → null cell, not a crash
    assert(a(2L) == a(3L) && a(0L) != a(2L))
  }

  test("training is deterministic across runs and repartitionings") {
    val df = vecs2d((0L until 40L).map(i =>
      i -> Seq((i % 7).toDouble, (i % 5).toDouble)): _*)
    val a = Clustering.kmeansCentroids(df, "id", "v", 4, 3)
    val b = Clustering.kmeansCentroids(df.repartition(7), "id", "v", 4, 3)
    assert(a.map(_._2.toSeq) == b.map(_._2.toSeq))
  }

  test("clusterInertia is the quantized sum of l2^2 to the trained centroid") {
    val df = vecs2d(0L -> Seq(1.0, 2.0), 1L -> Seq(3.0, 4.0))
    val out = Clustering.clusterInertia(df, "id", "v", k = 1, iters = 1)
      .select("cell", "n", "wss").as[(Int, Long, Double)].head()
    val q = Clustering.Quant
    // trained centroid after one iteration = quantized mean of both rows
    val c = Seq(Seq(1.0, 3.0), Seq(2.0, 4.0)).map(xs =>
      xs.map(x => math.floor(x * q).toLong).sum.toDouble / q / 2)
    def l2(v: Seq[Double]) =
      v.zip(c).foldLeft(0.0) { case (a, (x, cx)) =>
        a + (x - cx) * (x - cx) }
    val wss = Seq(Seq(1.0, 2.0), Seq(3.0, 4.0))
      .map(v => math.floor(l2(v) * q).toLong).sum.toDouble / q
    assert(out == ((0, 2L, wss)))
  }

  test("semanticDedupByCluster keeps one representative per near-dup set") {
    // ids 0/1 are near-identical (cosine ~1), 2 is orthogonal-ish in the
    // same mode, 3/4 form a second mode's near-dup pair
    val df = vecs2d(
      0L -> Seq(1.0, 0.01), 1L -> Seq(1.0, 0.011), 2L -> Seq(0.01, 1.0),
      3L -> Seq(-1.0, -0.01), 4L -> Seq(-1.0, -0.012))
    val kept = Clustering.semanticDedupByCluster(df, "id", "v", k = 2,
        iters = 3, threshold = 0.99)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(0L, 2L, 3L))
  }

  test("clusterSample caps every cluster and is replay-stable") {
    val df = vecs2d((0L until 60L).map(i =>
      i -> Seq(if (i < 50) 0.0 + (i % 3) * 0.01 else 10.0, 0.0)): _*)
    val s1 = Clustering.clusterSample(df, "id", "v", k = 2, iters = 2,
      perCluster = 5, salt = "t")
    val rows = s1.collect()
    val perCell = rows.groupBy(_.getInt(1)).view.mapValues(_.length).toMap
    assert(perCell.values.forall(_ <= 5))
    // the dominant mode (50 points) contributes no more than the rare one
    assert(perCell.values.sum <= 10)
    val s2 = Clustering.clusterSample(df, "id", "v", k = 2, iters = 2,
      perCluster = 5, salt = "t").collect()
    assert(rows.map(_.getLong(0)).sorted.sameElements(
      s2.map(_.getLong(0)).sorted))
  }
}
