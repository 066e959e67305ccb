package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, as codegen'd
  * higher-order-function programs (no UDF, no driver involvement).
  *
  * Convention: elements are cast to double before any arithmetic and
  * reduced strictly left-to-right (`aggregate` folds in index order), so
  * results are bit-deterministic across partitionings — a requirement for
  * oracle comparison and for reproducible dedup decisions at scale.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    graft.functions.expressions.ColumnBridge.column(
      graft.functions.expressions.DotProduct(
        graft.functions.expressions.ColumnBridge.expression(a),
        graft.functions.expressions.ColumnBridge.expression(b)))

  /** Composed higher-order-function form — the executable specification
    * [[graft.functions.expressions.DotProduct]] is parity-tested
    * against (identical IEEE fold order, so bit-equal results). */
  def dotComposed(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; NULL-safe-ish: 0.0 when either norm is zero. */
  def cosine(a: Column, b: Column): Column =
    cosineFromParts(dot(a, b), norm(a), norm(b))

  /** Cosine from precomputed parts — lets pairwise operators compute each
    * side's norm ONCE per vector before the join instead of once per pair
    * (3× fewer folds in the pair loop); the expression tree is identical
    * to [[cosine]]'s, so results are bit-equal. */
  def cosineFromParts(d: Column, na: Column, nb: Column): Column =
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))

  /** Squared L2 distance. */
  def l2Sq(a: Column, b: Column): Column =
    graft.functions.expressions.ColumnBridge.column(
      graft.functions.expressions.L2Squared(
        graft.functions.expressions.ColumnBridge.expression(a),
        graft.functions.expressions.ColumnBridge.expression(b)))

  /** Composed form — the executable specification of
    * [[graft.functions.expressions.L2Squared]]. */
  def l2SqComposed(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val dv = x.cast("double") - y.cast("double")
        dv * dv
      }),
      lit(0.0), (acc, v) => acc + v)

  /** Random-hyperplane signature: sign bits of dot products against
    * `planes` (deterministic, seeded off-line), packed into a long.
    * This is the SimHash/LSH bucket key for ANN (§ Similarity). */
  def hyperplaneSignature(vec: Column, planes: Seq[Seq[Double]]): Column = {
    require(planes.nonEmpty && planes.size <= 63, "1..63 planes per signature")
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(vec, planeCol) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Deterministic pseudo-random unit-ish hyperplanes from a seed
    * (driver-side constant folding; executors only see literals). */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Integer-lattice hyperplanes: coefficient j of plane p is
    * `((a_p * j + b_p) mod 1e9+7) mod 9 - 4` with per-plane universal-hash
    * coefficients (a, b) drawn from `seed`. Statistically these behave
    * like the Gaussian planes for sign-LSH (symmetric around 0, mean 0)
    * but — being small exact integers — any engine can reproduce the
    * signature bit-for-bit from the same (a, b) table, which Gaussian
    * draws cannot guarantee across RNG implementations. */
  def latticePlanes(nPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val M = 1000000007L
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes) {
      val a = 1L + rng.nextInt((M - 1).toInt)
      val b = rng.nextInt(M.toInt).toLong
      (1 to dim).map(j => ((a * j + b) % M % 9 - 4).toDouble)
    }
  }
}
