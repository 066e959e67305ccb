package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.expressions.ColumnBridge

/** Deterministic corpus shuffle + shard export — the last step before a
  * training run reads the data. A training data loader needs (a) a
  * reproducible global permutation (the run must be restartable and
  * byte-identical across re-executions), (b) the permutation cut into
  * shards a loader worker can claim wholesale, and (c) a manifest of
  * per-shard row/token totals for deterministic epoch accounting.
  *
  * The permutation is hash-driven, not `rand()`-driven: order key =
  * polyHash(id ∥ salt) with the id as tie-break — a pure function of the
  * data, so replays, retries and speculative re-executions all agree
  * (same rule [[Sampling]] and [[Sequences.packSequences]] use). Salt
  * rotation gives a fresh epoch-wise permutation with zero state.
  *
  * Scale: shard assignment is a row-local hash; the only exchange is the
  * shard-partitioned sort for `shard_pos` — with shards sized ~1–10 GB
  * (pick numShards accordingly at 100 TB: 10k–100k), each shard sorts in
  * parallel and nothing passes through a single partition. Shards are
  * hash-balanced to ±O(√(n/numShards)).
  */
object Sharding {

  /** Assign every row its (shard, shard_pos) under the salted-hash
    * permutation: shard = polyHash(id∥salt) mod numShards, shard_pos =
    * 0-based rank of the row inside its shard ordered by (full hash,
    * id). Reading shards 0..numShards−1 each in shard_pos order replays
    * one global deterministic shuffle of the corpus. */
  def shuffleShards(df: DataFrame, idCol: String, numShards: Int,
                    salt: String = ""): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val h = ColumnBridge.polyHash(concat(col(idCol).cast("string"), lit(salt)))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(numShards.toLong)))
      .withColumn("shard_pos", row_number().over(w).cast("long") - 1L)
      .drop("__h")
  }

  /** Per-shard manifest over a [[shuffleShards]] result: row count and
    * the sum of `weightCol` (token counts, bytes — exact integer
    * accumulation). One partial-aggregated exchange of numShards rows. */
  def shardManifest(sharded: DataFrame, weightCol: String): DataFrame =
    sharded.groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        sum(col(weightCol).cast("long")).as("total_weight"))

  /** Z-VALUE of a row over `n` integer dimensions: quantize each column
    * into 2^bits buckets across its [min, max] range, then interleave
    * the bucket bits (dimension i contributes bit b to output position
    * b·n + i). Rows close in EVERY dimension get close z-values, so a
    * z-sorted layout gives every dimension's predicates real file/
    * row-group min-max pruning — the multi-dimensional data-skipping
    * trick a single sort column cannot provide.
    *
    * `bounds` are caller-supplied (compute once via [[zorderBounds]] —
    * a single aggregate control-read of 2·n longs); quantization runs
    * in double (both the engine and the DuckDB oracle compute the same
    * IEEE ops) with a top-bucket clamp so x = max never overflows the
    * bit budget. bits·n must fit a long (≤ 63). */
  def zorderValue(cols: Seq[Column], bounds: Seq[(Long, Long)],
                  bits: Int): Column = {
    val n = cols.size
    require(n >= 1 && bounds.size == n, s"need bounds per column")
    require(bits >= 1 && bits * n <= 63,
      s"bits($bits) × dims($n) must be ≤ 63")
    val qs = cols.zip(bounds).map { case (c, (mn, mx)) =>
      require(mx >= mn, s"invalid bounds [$mn, $mx]")
      // range arithmetic in BigInt: a dimension spanning more than
      // Long.MaxValue values (e.g. z-ordering on an xxhash64 column)
      // overflows (mx - mn + 1) and (c - mn) in Long, silently producing
      // a garbage scale / negative offsets — fail fast instead.
      val range = BigInt(mx) - BigInt(mn) + 1
      require(range <= BigInt(Long.MaxValue),
        s"dimension range [$mn, $mx] spans $range values (> Long.MaxValue);" +
          " z-order needs a narrower dimension (pre-bucket a hash column" +
          " with pmod before z-ordering on it)")
      val scale = math.pow(2.0, bits) / range.toDouble
      least(floor((c.cast("long") - lit(mn)).cast("double") * lit(scale))
        .cast("long"), lit((1L << bits) - 1))
    }
    (0 until bits).flatMap { b =>
      qs.zipWithIndex.map { case (q, i) =>
        shiftleft(shiftright(q, b).bitwiseAND(lit(1L)), b * n + i)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Per-column (min, max) for [[zorderValue]] — one aggregate, 2·n
    * longs back to the driver. */
  def zorderBounds(df: DataFrame, cols: Seq[String]): Seq[(Long, Long)] = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c).cast("long")).as(s"__mn_$c"),
        max(col(c).cast("long")).as(s"__mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map(i => (row.getLong(2 * i), row.getLong(2 * i + 1)))
  }

  /** Write `df` z-ordered on `cols` into ~`targetFiles` files: range-
    * partition by z-value (so files tile the z-curve), sort within each
    * partition, drop the helper column. Every file then covers a narrow
    * min-max box in EVERY `cols` dimension — parquet row-group stats
    * prune multi-dimensional predicates instead of only the leading
    * sort key's. */
  def writeZOrdered(df: DataFrame, root: String, cols: Seq[String],
                    bits: Int = 16, targetFiles: Int = 64): Unit = {
    val bounds = zorderBounds(df, cols)
    df.withColumn("__z", zorderValue(cols.map(col), bounds, bits))
      .repartitionByRange(targetFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(root)
  }

  /** Write a [[shuffleShards]] result as one directory per shard
    * (`root/shard=N/`), each shard's rows pre-sorted by shard_pos so a
    * loader worker streams its shard in permutation order without its
    * own sort. */
  def writeShards(sharded: DataFrame, root: String): Unit =
    sharded
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(root)
}
