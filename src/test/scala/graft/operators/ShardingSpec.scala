package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 200L).map(i => (i, 10L + i % 7)).toDF("id", "w")

  test("every row keeps exactly one (shard, pos) slot; positions are dense") {
    val sh = Sharding.shuffleShards(docs, "id", numShards = 4, salt = "s1")
    assert(sh.count() === 200L)
    assert(sh.select("shard").distinct().as[Long].collect().toSet
      .subsetOf((0L until 4L).toSet))
    // dense 0..n-1 positions per shard
    val bad = sh.groupBy("shard")
      .agg(count(lit(1)).as("n"), max(col("shard_pos")).as("mx"),
        min(col("shard_pos")).as("mn"),
        count_distinct(col("shard_pos")).as("nd"))
      .filter(col("mx") =!= col("n") - 1 || col("mn") =!= 0 ||
        col("nd") =!= col("n"))
      .count()
    assert(bad === 0L)
  }

  test("the permutation is deterministic and salt-sensitive") {
    val a = Sharding.shuffleShards(docs, "id", 4, "s1")
      .select("id", "shard", "shard_pos").as[(Long, Long, Long)].collect().toSet
    val b = Sharding.shuffleShards(docs, "id", 4, "s1")
      .select("id", "shard", "shard_pos").as[(Long, Long, Long)].collect().toSet
    val c = Sharding.shuffleShards(docs, "id", 4, "s2")
      .select("id", "shard", "shard_pos").as[(Long, Long, Long)].collect().toSet
    assert(a === b)        // replay-stable
    assert(a !== c)        // a new salt is a new permutation
  }

  test("manifest totals reconcile with the corpus exactly") {
    val sh = Sharding.shuffleShards(docs, "id", 4, "s1")
    val m = Sharding.shardManifest(sh, "w")
    val (rows, weight) = m.agg(sum("n_rows"), sum("total_weight"))
      .as[(Long, Long)].head()
    val expectWeight = docs.agg(sum("w")).as[Long].head()
    assert(rows === 200L && weight === expectWeight)
  }

  test("writeShards lays each shard out in shard_pos order") {
    val root = java.nio.file.Files.createTempDirectory("graft_shards_").toString
    val sh = Sharding.shuffleShards(docs, "id", 4, "s1")
    Sharding.writeShards(sh, root)
    val back = spark.read.parquet(root)
    assert(back.count() === 200L)
    // within each file, rows must already be in shard_pos order: compare
    // each row to its predecessor in file read order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("f").orderBy("seen")
    val viol = back
      .withColumn("f", input_file_name())
      .withColumn("seen", monotonically_increasing_id())
      .withColumn("prev", lag("shard_pos", 1).over(w))
      .filter(col("prev").isNotNull && col("shard_pos") <= col("prev"))
      .count()
    assert(viol === 0L)
  }
}
