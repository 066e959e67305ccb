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

  test("idCol spreads a hot key of bit-identical rows across all salts") {
    // the adversarial case: every row of the hot key is identical, so the
    // content-hash fallback collapses to ONE salt — a row-unique id must
    // restore the spread
    val df = (1 to 640).map(i => ("hot", i.toLong, 1.0)).toDF("k", "id", "v")
    val withId = df.select(Skew.saltExpr(df, Some("id"), 16).as("salt"))
      .distinct().count()
    assert(withId === 16, "row-unique id reaches every salt")
    val identical = df.drop("id").select(lit("hot").as("k"), lit(1.0).as("v"))
    val collapsed = identical
      .select(Skew.saltExpr(identical, None, 16).as("salt")).distinct().count()
    assert(collapsed === 1, "documented caveat: identical rows co-locate")
    // correctness is salt-independent either way
    val out = Skew.saltedSum(df, Seq("k"), "v", salts = 16, idCol = Some("id"))
      .as[(String, Double, Long)].collect().toMap2
    assert(out("hot") === ((640.0, 640L)))
  }

  test("salt is a pure function of row content, stable under repartition") {
    val df = (1 to 200).map(i => ("k" + i % 7, i.toLong)).toDF("k", "id")
    val a = df.select($"id", Skew.saltExpr(df, None, 8).as("s"))
      .as[(Long, Long)].collect().toMap
    val rep = df.repartition(13)
    val b = rep.select($"id", Skew.saltExpr(rep, None, 8).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(a === b, "no spark_partition_id dependence — retry/replay stable")
  }

  test("saltedJoin with no non-key columns stays deterministic and correct") {
    // pre-fix this path fell back to spark_partition_id() % salts
    val left = ((1 to 300).map(_ => "hot") ++ (1 to 50).map("k" + _)).toDF("k")
    val right = (Seq("hot") ++ (1 to 50).map("k" + _)).map(k => (k, k.length))
      .toDF("k", "attr")
    val plain = left.join(right, Seq("k")).as[(String, Int)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    val salted = Skew.saltedJoin(left, right, Seq("k"), salts = 8)
      .as[(String, Int)].collect().groupBy(identity).view.mapValues(_.length).toMap
    assert(salted === plain, "multiset-equal to the plain join")
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
