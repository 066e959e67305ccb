package graft.functions.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class HammingPairsSpec extends SparkSpec {
  import spark.implicits._

  private def pairsOf(buckets: Seq[Seq[(Long, Long)]], maxDist: Int) = {
    val df = buckets.toDF("raw")
      .select(transform(col("raw"),
        r => struct(r.getField("_1").as("id"), r.getField("_2").as("sig")))
        .as("ms"))
    val native = df.select(explode(ColumnBridge.column(
        HammingPairs(ColumnBridge.expression(col("ms")), maxDist))).as("p"))
      .select("p.id_a", "p.id_b", "p.hamming")
      .as[(Long, Long, Int)].collect().toSet
    val composed = df.select(explode(
        graft.operators.Dedup.hammingPairsComposed(col("ms"), maxDist)).as("p"))
      .select("p.id_a", "p.id_b", "p.hamming")
      .as[(Long, Long, Int)].collect().toSet
    (native, composed)
  }

  test("native pair kernel matches the composed column program exactly") {
    val rng = new scala.util.Random(11)
    val buckets = Seq.fill(20)(
      Seq.fill(1 + rng.nextInt(12))((rng.nextInt(1000).toLong,
        rng.nextLong() & ((1L << 48) - 1))))
    val (native, composed) = pairsOf(buckets, maxDist = 3)
    assert(native === composed)
    assert((native ++ composed).forall(_._3 <= 3))
  }

  test("identical signatures pair at distance 0; empty bucket yields none") {
    val (native, _) = pairsOf(Seq(
      Seq((1L, 42L), (2L, 42L), (3L, 43L)), Seq.empty), maxDist = 0)
    assert(native === Set((1L, 2L, 0)))
  }

  test("native id-pair kernel matches the composed column program exactly") {
    val rng = new scala.util.Random(13)
    val df = Seq.fill(25)(Seq.fill(rng.nextInt(15))(rng.nextInt(500).toLong).sorted)
      .toDF("ids")
    val native = df.select(explode(
        graft.operators.Dedup.idPairs(col("ids"))).as("p"))
      .select("p.id_a", "p.id_b").as[(Long, Long)].collect().toSeq.sorted
    val composed = df.select(explode(
        graft.operators.Dedup.idPairsComposed(col("ids"))).as("p"))
      .select("p.id_a", "p.id_b").as[(Long, Long)].collect().toSeq.sorted
    assert(native === composed)
    assert(native.size === composed.size)
  }
}
