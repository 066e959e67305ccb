package graft.operators

import org.apache.spark.sql.DataFrame
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
