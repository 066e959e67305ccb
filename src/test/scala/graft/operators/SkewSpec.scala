package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on skewed data") {
    // 90% of left rows share one hot key
    val left = ((1 to 900).map(i => ("hot", s"l$i")) ++
      (1 to 100).map(i => (s"k$i", s"l$i"))).toDF("k", "payload")
    val right = (Seq("hot") ++ (1 to 100).map("k" + _)).map(k => (k, k.length))
      .toDF("k", "attr")
    val plain = left.join(right, Seq("k"))
      .select("k", "payload", "attr").as[(String, String, Int)]
      .collect().toSet
    val salted = Skew.saltedJoin(left, right, Seq("k"), salts = 8)
      .select("k", "payload", "attr").as[(String, String, Int)]
      .collect().toSet
    assert(salted === plain)
    assert(salted.size === 1000)
  }

  test("saltedSum equals direct aggregation") {
    val df = ((1 to 500).map(i => ("hot", i.toDouble)) ++
      Seq(("cold", 1.0), ("cold", 2.0))).toDF("k", "v")
    val out = Skew.saltedSum(df, Seq("k"), "v", salts = 4)
      .as[(String, Double, Long)].collect().toMap2
    assert(out("hot") === ((500 * 501 / 2.0, 500L)))
    assert(out("cold") === ((3.0, 2L)))
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
