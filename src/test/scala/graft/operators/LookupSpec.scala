package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LookupSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    "warm" -> Seq("red", "orange"),
    "cool" -> Seq("blue"),
    "reddish" -> Seq("red")) // never wins: "warm" has priority

  test("first matching rule wins, fallback otherwise") {
    val df = Seq("red widget", "blue bolt", "plain thing").toDF("name")
    val out = df.select(Lookup.classify(col("name"), rules,
        fallback = "other").as("c")).as[String].collect().toSeq
    assert(out === Seq("warm", "cool", "other"))
  }

  test("case sensitivity flag") {
    val df = Seq("RED widget").toDF("name")
    assert(df.select(Lookup.classify(col("name"), rules, caseSensitive = true,
      fallback = "other").as("c")).head().getString(0) === "other")
    assert(df.select(Lookup.classify(col("name"), rules, caseSensitive = false,
      fallback = "other").as("c")).head().getString(0) === "warm")
  }

  test("classifyJoin agrees with when-chain on priority") {
    val df = Seq((1L, "red widget"), (2L, "blue bolt"), (3L, "plain")).toDF("id", "name")
    val ruleDf = Seq(("warm", "red", 0), ("cool", "blue", 1), ("reddish", "red", 2))
      .toDF("label", "value", "priority")
    val out = Lookup.classifyJoin(df, "id", "name", ruleDf, fallback = "other")
      .select("id", "label").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "warm", 2L -> "cool", 3L -> "other"))
  }
}
