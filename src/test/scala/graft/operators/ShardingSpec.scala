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

  test("zorderValue interleaves quantized bits per the definition") {
    // 2 dims × 2 bits over [0,3]: quantized value == raw value, and the
    // z-value is the classic Morton interleave
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (2L, 1L))
      .toDF("x", "y")
    val out = df.withColumn("z",
        Sharding.zorderValue(Seq(col("x"), col("y")),
          Seq((0L, 3L), (0L, 3L)), bits = 2))
      .as[(Long, Long, Long)].collect().toSet
    assert(out === Set((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L),
      (3L, 3L, 15L), (2L, 1L, 6L)))
  }

  test("zorderValue clamps the max value into the top bucket") {
    val df = Seq((100L)).toDF("x")
    val z = df.select(Sharding.zorderValue(Seq(col("x")),
      Seq((0L, 100L)), bits = 4)).as[Long].head()
    assert(z === 15L)
    intercept[IllegalArgumentException] {
      Sharding.zorderValue(Seq(col("x"), col("x")), Seq((0L, 1L), (0L, 1L)),
        bits = 32) // 64 bits > 63
    }
  }

  test("zorderValue fails fast on a dimension wider than Long.MaxValue") {
    // z-ordering on a raw hash column: range spans ~2^64 values and the
    // Long scale arithmetic would silently corrupt the layout
    val e = intercept[IllegalArgumentException] {
      Sharding.zorderValue(Seq(col("x")),
        Seq((Long.MinValue, Long.MaxValue)), bits = 8)
    }
    assert(e.getMessage.contains("pre-bucket"))
    // a full-positive-range dimension is exactly Long.MaxValue values: ok
    Sharding.zorderValue(Seq(col("x")), Seq((0L, Long.MaxValue - 1)), 8)
  }

  test("z-ordered layout prunes BOTH dimensions; x-sorted prunes only x") {
    // 90k rows on a 300×300 grid; 36 files per layout
    val grid = spark.range(90000).selectExpr("id % 300 AS x", "id DIV 300 AS y",
      "id AS payload")
    val zroot = java.nio.file.Files.createTempDirectory("graft_z_").toString
    val xroot = java.nio.file.Files.createTempDirectory("graft_x_").toString
    Sharding.writeZOrdered(grid, zroot, Seq("x", "y"), bits = 9,
      targetFiles = 36)
    grid.repartitionByRange(36, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(xroot)
    // per-file min-max boxes, the stats parquet pruning actually uses
    def boxes(root: String) = spark.read.parquet(root)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"))
      .as[(String, Long, Long, Long, Long)].collect()
    def touched(bs: Seq[(String, Long, Long, Long, Long)],
                x: (Long, Long), y: (Long, Long)) =
      bs.count { case (_, x0, x1, y0, y1) =>
        x0 <= x._2 && x._1 <= x1 && y0 <= y._2 && y._1 <= y1 }
    val zb = boxes(zroot).toSeq; val xb = boxes(xroot).toSeq
    assert(zb.size >= 30 && xb.size >= 30)
    // filter ONLY on y (the non-leading dimension for the x-sort):
    // the x-sorted layout can prune nothing; the z-order must
    val yOnly = (150L, 170L)
    assert(touched(xb, (0L, 299L), yOnly) === xb.size)
    assert(touched(zb, (0L, 299L), yOnly) <= zb.size / 2,
      s"z-layout touched ${touched(zb, (0L, 299L), yOnly)}/${zb.size}")
    // a small box in BOTH dims: z-order prunes to a handful of files
    assert(touched(zb, (10L, 40L), (10L, 40L)) <= zb.size / 4)
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
