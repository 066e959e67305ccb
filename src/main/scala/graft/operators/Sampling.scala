package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * `rand()`-based sampling is non-reproducible across retries and
  * re-partitions — poison for exactly-once pipelines and for train/test
  * hygiene (a re-run must not shuffle examples across splits). Everything
  * here derives from the portable rolling hash of the example's ID, so
  * assignment is a pure function of identity: stable under replays,
  * partitioning, and engine (the DuckDB oracle reproduces it).
  */
object Sampling {

  /** Hash bucket in [0, buckets) from the id column + salt. */
  def hashBucket(id: Column, buckets: Int, salt: String = ""): Column =
    pmod(graft.functions.expressions.ColumnBridge.polyHash(
      concat(id.cast("string"), lit(salt))), lit(buckets.toLong))

  /** Literal CASE over a stratum column — configuration-sized, so no
    * join: the shared shape of the quota and fraction samplers. A null
    * stratum matches no arm and takes the default. */
  private def strataCase[A](strataCol: String, arms: Seq[(String, A)],
                            default: A)(toLit: A => Column): Column =
    arms.foldLeft(Option.empty[Column]) {
      case (acc, (value, a)) =>
        val cond = col(strataCol) === value
        Some(acc.fold(when(cond, toLit(a)))(_.when(cond, toLit(a))))
    }.fold(toLit(default))(_.otherwise(toLit(default)))

  /** Assign each row a named split by weight, e.g.
    * Seq("train" -> 80, "val" -> 10, "test" -> 10) (weights sum ≤ the
    * bucket count; assignment by cumulative ranges over 1000 buckets). */
  def deterministicSplit(df: DataFrame, idCol: String,
                         weights: Seq[(String, Int)],
                         salt: String = "",
                         out: String = "split"): DataFrame = {
    val total = weights.map(_._2).sum
    require(total > 0, "weights must be positive")
    val bucket = hashBucket(col(idCol), total, salt)
    val (cases, _) = weights.foldLeft((Option.empty[Column], 0)) {
      case ((acc, cum), (name, w)) =>
        val cond = bucket >= cum && bucket < cum + w
        val next = acc match {
          case None => when(cond, lit(name))
          case Some(c) => c.when(cond, lit(name))
        }
        (Some(next), cum + w)
    }
    df.withColumn(out, cases.get)
  }

  /** Deterministic per-stratum sample: the `k` rows with the smallest
    * salted id-hash per stratum — a reproducible "random-looking" sample
    * whose membership never changes under replays. One shuffle on the
    * strata; row_number caps memory per group. */
  def stratifiedTopK(df: DataFrame, strataCols: Seq[String], idCol: String,
                     k: Int, salt: String = ""): DataFrame = {
    val h = hashBucket(col(idCol), 1000000007, salt)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(h.asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Deterministic TOKEN-BUDGET sample: take documents in salted-hash
    * order until the cumulative token count reaches `budget` (a doc is
    * kept iff its inclusive running total still fits). This is how a
    * training mix is actually sized — "x billion tokens of this source"
    * — and hash order makes the kept set a pure function of (ids, salt,
    * budget): stable under replays, and growing the budget only ADDS
    * documents, never swaps them.
    *
    * Scale: the global running sum is the two-phase prefix sum
    * ([[Relational.prefixSum]]) over `buckets` coarse hash ranges — no
    * single-partition window anywhere. */
  def tokenBudgetSample(df: DataFrame, idCol: String, tokensCol: String,
                        budget: Long, salt: String = "",
                        buckets: Int = 64): DataFrame = {
    val withH = df.withColumn("__h", hashBucket(col(idCol), 1000000007, salt))
    // bucket = coarse monotone prefix of the hash order (h·B / p)
    val bucket = floor(col("__h") * buckets / lit(1000000007L))
    Relational.prefixSum(withH, bucket, Seq(col("__h"), col(idCol)),
        col(tokensCol).cast("long"), "__cum")
      .filter(col("__cum") <= budget)
      .drop("__h", "__cum")
  }

  /** Deterministic per-stratum FRACTION sample: keep a row iff its salted
    * id-hash falls below the stratum's keep fraction — the rate-based
    * sibling of [[quotaSample]] (fractions scale with the corpus, quotas
    * don't). Pure function of (id, salt, fractions): replay-stable, and
    * raising a fraction only ADDS documents. Fractions are
    * configuration-sized → a literal CASE, no join, NO shuffle at all
    * (this is the one sampler here that is embarrassingly parallel). */
  def fractionSample(df: DataFrame, strataCol: String, idCol: String,
                     fractions: Seq[(String, Double)], defaultFraction: Double,
                     salt: String = ""): DataFrame = {
    (fractions :+ ("<default>" -> defaultFraction)).foreach { case (s, f) =>
      require(f >= 0.0 && f <= 1.0, s"fraction out of [0,1] for '$s': $f") }
    // the raw rolling hash of a SHORT id string stays far below the
    // modulus (≤ 31^len·c), so "h < f·p" would keep everything; one
    // affine spreading step (a bijection on Z_p, exact in Long: h < p ≈
    // 2^30, a ≈ 2^30 → h·a < 2^61) equidistributes the compare key over
    // [0, p). Order-only consumers (topK/packing) don't need this —
    // threshold compares do.
    val h = pmod(
      hashBucket(col(idCol), 1000000007, salt) * lit(1103515245L)
        + lit(12345L), lit(1000000007L)).cast("double")
    val frac = strataCase(strataCol, fractions, defaultFraction)(f => lit(f))
    df.filter(h < frac * lit(1000000007.0))
  }

  /** Epoch-style OVERSAMPLING: per-stratum repeat factors that may
    * exceed 1 — the standard mixture recipe where high-quality sources
    * repeat for multiple "epochs" of the mix while bulk sources are
    * downsampled. Each row emits ⌊f⌋ full copies plus one more when
    * its salted spread hash falls below frac(f), so the expected copy
    * count is exactly f per row and the kept set is replay-stable
    * (f ≤ 1 degenerates to [[fractionSample]]'s keep rule with the
    * SAME hash, so a mixed up/down-sampling config is one operator).
    * Output adds `rep` (0-based copy index) so downstream
    * shuffling/packing can distinguish copies.
    *
    * Scale shape: row-local explode, no shuffle; output volume is
    * Σ fᵢ·nᵢ by construction — bound the factors, not the operator. */
  def repeatSample(df: DataFrame, strataCol: String, idCol: String,
                   factors: Seq[(String, Double)], defaultFactor: Double,
                   salt: String = ""): DataFrame = {
    (factors :+ ("<default>" -> defaultFactor)).foreach { case (s, f) =>
      require(f >= 0.0 && f <= 1000.0,
        s"repeat factor out of [0, 1000] for '$s': $f") }
    val h = pmod(
      hashBucket(col(idCol), 1000000007, salt) * lit(1103515245L)
        + lit(12345L), lit(1000000007L)).cast("double")
    val f = strataCase(strataCol, factors, defaultFactor)(x => lit(x))
    val n = (floor(f).cast("int") +
      when(h < (f - floor(f)) * lit(1000000007.0), lit(1)).otherwise(lit(0)))
    // sequence(0, -1) would count DOWN — zero-copy rows need the
    // explicit empty branch (the sampleFrames lesson)
    df.withColumn("rep",
      explode(when(n <= 0, array().cast("array<int>"))
        .otherwise(sequence(lit(0), n - 1))))
  }

  /** Temperature-weighted keep fractions for [[fractionSample]] — the
    * standard multilingual/domain rebalancing rule: stratum i with nᵢ of
    * N docs gets target share nᵢ^α / Σ nⱼ^α of a `budget`-doc mix, i.e.
    * keep fraction min(1, budget·shareᵢ/nᵢ). α < 1 flattens the mix
    * (α=0 uniform across strata, α=1 natural); α=0.5 goes through
    * `sqrt` (correctly rounded per IEEE-754, so any engine reproduces
    * the fractions bit-for-bit — `pow` carries no such guarantee).
    *
    * Driver-side on the per-stratum COUNTS only (bounded control read:
    * one row per language/domain); the returned literals then drive the
    * shuffle-free sampler. */
  def temperatureFractions(df: DataFrame, strataCol: String, alpha: Double,
                           budget: Long): Seq[(String, Double)] = {
    require(alpha >= 0.0, s"alpha must be non-negative, got $alpha")
    // null strata are excluded from the weighting: they match no CASE
    // arm in fractionSample and take its defaultFraction there
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol)).count()
      .collect()
      .map(r => (r.get(0).toString, r.getLong(1)))
      .sortBy(_._1) // deterministic weight-sum order
    val weights = counts.map { case (s, n) =>
      (s, n, if (alpha == 0.5) math.sqrt(n.toDouble)
             else math.pow(n.toDouble, alpha)) }
    val z = weights.map(_._3).sum
    weights.map { case (s, n, w) =>
      s -> math.min(1.0, budget.toDouble * (w / z) / n.toDouble) }.toSeq
  }

  /** Per-stratum QUOTA sample: [[stratifiedTopK]] with a per-stratum
    * cap — the domain-mixing primitive ("20 docs of en, 10 of de, 5 of
    * anything else"). Quotas are configuration-sized, so they compile to
    * a literal CASE over the stratum value: no join, one shuffle on the
    * strata. */
  def quotaSample(df: DataFrame, strataCol: String, idCol: String,
                  quotas: Seq[(String, Int)], defaultK: Int,
                  salt: String = ""): DataFrame = {
    val h = hashBucket(col(idCol), 1000000007, salt)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(h.asc, col(idCol).asc)
    val quota = strataCase(strataCol, quotas, defaultK)(k => lit(k))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota)
      .drop("__rn")
  }

  /** Quality-threshold selection: keep each stratum's top `frac` of rows
    * by `scoreCol` — "top 25% by quality score per source", the
    * percentile-gated filter curation recipes apply after scoring. The
    * cut is the stratum's (1−frac) quantile (linear interpolation);
    * rows AT the threshold are kept, so ties never split
    * non-deterministically and the kept fraction can exceed `frac` by
    * the tie mass (the reproducible choice — a row's fate never depends
    * on partitioning).
    *
    * Scale: thresholds are one row per stratum (broadcast back — no
    * second shuffle of the data); exact percentile buffers each
    * stratum's scores, so for strata beyond executor memory set
    * `approx = true` to compute the cut with mergeable
    * percentile_approx sketch state instead (rank error ≤ 1/accuracy —
    * the threshold moves by at most that rank mass; membership stays
    * deterministic for a fixed input). */
  def topFractionByScore(df: DataFrame, strataCol: String, scoreCol: String,
                         frac: Double, approx: Boolean = false,
                         accuracy: Int = 10000): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0, 1], got $frac")
    val thr =
      if (approx)
        Sketches.approxQuantiles(df, Seq(strataCol), scoreCol,
          Seq(("__thr", 1.0 - frac)), accuracy)
      else
        Sketches.quantiles(df, Seq(strataCol), scoreCol,
          Seq(("__thr", 1.0 - frac)))
    // null-safe (<=>) join: groupBy emits a threshold row for the null
    // stratum too, but a plain equi-join never matches it — null-stratum
    // rows would silently vanish from the output instead of being gated
    // by their own stratum's threshold.
    val t = thr.withColumnRenamed(strataCol, "__strata")
    df.join(broadcast(t), col(strataCol) <=> col("__strata"))
      .filter(col(scoreCol) >= col("__thr"))
      .drop("__thr", "__strata")
  }
}
