package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StructField, StructType}

/** Deterministic Lloyd's k-means over an embedding column — the
  * centroid-TRAINING stage the IVF serving family ([[Similarity.ivfTopK]],
  * [[IvfStore]]) consumes, and the cluster backbone for diversity
  * sampling / SemDedup-style corpus shaping. The reference has no
  * clustering; this is part of the LLM-curation tier (SURVEY §2's
  * "similarity search: IVF … as the scale path" needs trained centroids
  * from somewhere).
  *
  * Engine-portable by construction (every step reproduces bit-identically
  * in any SQL engine, so the whole trainer sits behind a DuckDB oracle):
  *
  *  - init: the k smallest-id vectors, cell = id rank (0-based);
  *  - assign: the native [[graft.functions.expressions.NearestCell]]
  *    argmin kernel via [[Similarity.assignCells]] — left-to-right IEEE
  *    L2 fold, smallest-cell ties — identical to the serving path, so
  *    trained centroids serve exactly as they trained;
  *  - update: per-dimension QUANTIZED mean — components are floored onto
  *    the 2^-20 grid and summed as exact longs, so each centroid
  *    component is one double division of two exact integers:
  *    order-independent under any partitioning, hence portable. The
  *    quantization bias is ≤ 2^-20 per component per contribution —
  *    immaterial against cluster geometry (embedding components are
  *    O(0.1)); determinism is what makes k-means oracle-checkable;
  *  - empty cells keep their previous centroid (standard Lloyd fallback,
  *    resolved driver-side on the bounded k·dim update read).
  *
  * Scale: one iteration = one narrow map (assign — vectors never leave
  * their partitions) + one (cell, dim)-keyed aggregation whose partial
  * sums map-side-combine to ≤ k·dim rows per task before the exchange;
  * the k·dim result is a bounded driver control read (the same idiom —
  * and size — as assignCells' centroid matrix, guarded below). Long sums
  * hold far past corpus scale: |floor(x·2^20)| ≤ 2^22 for |x| ≤ 4, so
  * overflow needs ~2^41 ≈ 2·10^12 contributions to one cell. Centroids
  * re-enter each round as plan literals (reference objects), so plan
  * depth does NOT grow with iterations — no checkpoint lineage problem.
  */
object Clustering {

  /** Quantization grid for the centroid update: 2^20. Multiplying a
    * double by a power of two is exact (exponent shift), floor is exact,
    * and the sum of the resulting longs is exact — the only rounding is
    * the deliberate grid snap. */
  val Quant: Double = 1048576.0

  /** Driver-side centroids → the (cell: int, cvec: array<double>) frame
    * every IVF-family consumer takes. Public so trained centroids can be
    * reused (assign/serve) without retraining. */
  def centroidDf(spark: SparkSession,
                 cents: Seq[(Int, Array[Double])]): DataFrame = {
    val rows = cents.map { case (c, v) => Row(c, v.toSeq) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("cell", IntegerType, nullable = false),
        StructField("cvec", ArrayType(DoubleType), nullable = false))))
  }

  /** Train centroids; returns them driver-side as (cell, components) in
    * ascending cell order. `iters = 0` returns the init verbatim. */
  def kmeansCentroids(vecs: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int): Seq[(Int, Array[Double])] = {
    require(k >= 1 && k <= 4096,
      s"k=$k out of [1, 4096] — centroids are a driver-side control read")
    require(iters >= 0 && iters <= 1000, s"iters=$iters out of [0, 1000]")
    val spark = vecs.sparkSession
    // null vectors and vectors with null ELEMENTS never train: the
    // assign kernel maps both to a null cell, and either inside the
    // init window would poison a centroid (a null element NPEs the
    // driver-side unboxing). Dimension-mismatched vectors still
    // surface as null cells downstream — same contract as assignCells
    // — and are dropped from the update aggregation below.
    val v = vecs.select(col(idCol).as("__id"),
        col(vecCol).cast("array<double>").as("__v"))
      .filter(col("__v").isNotNull && !exists(col("__v"), _.isNull))
    // bounded control read: k rows. orderBy+limit is a TakeOrdered — no
    // global sort, no single-partition exchange.
    val init = v.orderBy(col("__id").asc).limit(k).collect()
    require(init.nonEmpty, "kmeans needs at least one vector")
    var cents: Seq[(Int, Array[Double])] = init.zipWithIndex.map {
      case (r, i) =>
        (i, r.getSeq[Double](1).toArray)
    }
    val dim = cents.head._2.length
    var it = 0
    while (it < iters) {
      // driver-side centroids go straight into the kernel — no
      // parallelize + re-collect round trip per iteration
      val assigned = Similarity.assignCellsMatrix(v, "__id", "__v", cents)
      // exact integer sums on the 2^-20 grid; ≤ k·dim rows out. The
      // null-cell group (dimension-mismatched vectors) must not reach
      // the driver read — getInt on a null cell NPEs.
      val upd = assigned
        .filter(col("cell").isNotNull)
        .select(col("cell"), posexplode(col("cv")).as(Seq("j", "x")))
        .groupBy("cell", "j")
        .agg(sum(floor(col("x") * lit(Quant)).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val byCell = upd.groupBy(_.getInt(0))
      cents = cents.map { case (c, prev) =>
        byCell.get(c) match {
          case None => (c, prev) // empty cell: keep previous centroid
          case Some(rows) =>
            val nv = new Array[Double](dim)
            rows.foreach { r =>
              nv(r.getInt(1)) =
                r.getLong(2).toDouble / Quant / r.getLong(3).toDouble
            }
            (c, nv)
        }
      }
      it += 1
    }
    cents
  }

  /** Trained centroids as a (cell: int, cvec: array<double>) DataFrame —
    * the exact shape [[Similarity.ivfTopK]] / [[IvfStore]] take. */
  def kmeans(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
             iters: Int): DataFrame =
    centroidDf(vecs.sparkSession,
      kmeansCentroids(vecs, idCol, vecCol, k, iters))

  /** Train then assign: every vector's final cluster, as (idCol, cell).
    * The assignment reuses the serving-path kernel, so this IS the
    * corpus layout an IVF build over these centroids would produce. */
  def kmeansAssign(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
                   iters: Int): DataFrame = {
    val cents = kmeans(vecs, idCol, vecCol, k, iters)
    Similarity.assignCells(
        vecs.select(col(idCol), col(vecCol)), idCol, vecCol, cents)
      .select(col("nbr_id").as(idCol), col("cell"))
  }

  /** Cluster-balanced (diversity) sample: up to `perCluster` vectors per
    * trained cluster, chosen in salted-hash order —
    * [[Sampling.stratifiedTopK]] with the learned cell as the stratum.
    * Hash order makes the kept set replay-stable and independent of
    * cluster sizes, which is the point: a skew-heavy corpus (one dominant
    * mode) contributes no more than a rare one. One extra exchange over
    * the assignment (the per-cell window); cells are k-bounded so the
    * window partitions are dense. */
  def clusterSample(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
                    iters: Int, perCluster: Int,
                    salt: String = ""): DataFrame =
    Sampling.stratifiedTopK(
      kmeansAssign(vecs, idCol, vecCol, k, iters), Seq("cell"), idCol,
      perCluster, salt)

  /** Per-cluster size and within-cluster sum of squared distance — the
    * k-selection ("elbow") signal. Each vector's l2²-to-centroid is
    * floored onto the 2^-20 grid and summed as exact longs (the
    * centroid-update trick), so the metric reproduces bit-identically
    * in any engine. Output: (cell, n, wss). One narrow assign map + one
    * k-row aggregation. Long-sum headroom: unit-scale vectors at dim
    * 64 quantize to ~2^30 per row, so a single cell overflows only past
    * ~2^33 (8·10⁹) members — size k so cells stay below that. */
  def clusterInertia(vecs: DataFrame, idCol: String, vecCol: String,
                     k: Int, iters: Int): DataFrame = {
    val cents = kmeansCentroids(vecs, idCol, vecCol, k, iters)
    val cdf = centroidDf(vecs.sparkSession, cents)
    val assigned = Similarity.assignCells(
      vecs.select(col(idCol), col(vecCol)), idCol, vecCol, cdf)
    assigned.join(broadcast(cdf), Seq("cell"))
      .select(col("cell"),
        floor(graft.functions.VectorFunctions.l2Sq(col("cv"), col("cvec"))
          * lit(Quant)).cast("long").as("__d"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n"),
        (sum("__d").cast("double") / lit(Quant)).as("wss"))
  }

  /** SemDedup in its published form (k-means blocks → exact
    * within-block cosine → one representative per near-dup component):
    * train k clusters, compute all exact-cosine pairs inside each
    * cluster via [[Similarity.labelBlockedNearDup]] (per-block member
    * cap — no uncapped all-pairs path), chain pairs into components,
    * keep the min-id representative.
    *
    * The LSH-blocked sibling is [[Similarity.semanticDedup]]; this form
    * trades LSH's tunable recall for paper-faithful cluster blocking —
    * a pair is found only if both ends land in the SAME trained
    * cluster, so k sets the recall/cost trade (larger k = smaller
    * quadratic blocks, more missed boundary pairs). Within-block cost
    * is Σ n_cell², so size k to the corpus (cells of ~10⁴–10⁵ vectors)
    * and let `maxBlock` stop a degenerate centroid from recreating the
    * cross join. */
  def semanticDedupByCluster(vecs: DataFrame, idCol: String, vecCol: String,
                             k: Int, iters: Int, threshold: Double,
                             maxBlock: Int = 10000): DataFrame = {
    val assigned = kmeansAssign(vecs, idCol, vecCol, k, iters)
    val labeled = vecs.join(assigned, Seq(idCol))
    Similarity.keepRepresentatives(vecs, idCol,
      Similarity.labelBlockedNearDup(labeled, "cell", idCol, vecCol,
        threshold, maxBlock))
  }
}
