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
    val quota = quotas.foldLeft(Option.empty[Column]) {
      case (acc, (value, k)) =>
        val cond = col(strataCol) === value
        Some(acc.fold(when(cond, lit(k)))(_.when(cond, lit(k))))
    }.fold(lit(defaultK))(_.otherwise(lit(defaultK)))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota)
      .drop("__rn")
  }
}
