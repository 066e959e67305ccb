package graft.tools

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the lint core's broadcast-contract assertion: a
  * decontamination-shaped plan that LOST its broadcast (the silent
  * flip to sort-merge the 10M-doc e2e probe caught live) must be an
  * UNALLOWED finding, and the shipped, pinned plan must not be. */
class PlanLintSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq((1L, "alpha beta gamma delta"),
    (2L, "epsilon zeta eta theta")).toDF("doc_id", "text")
  private def eval = Seq(("alpha beta gamma delta")).toDF("text")

  test("the shipped decon plan carries its broadcast and passes the lint") {
    val plan = graft.operators.Decontamination
      .contaminatedIds(docs, "doc_id", "text", eval, "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      "boundedEvalBroadcast must pin the eval side:\n" + plan)
    val (_, unallowedHits) = PlanLint.planFindings("q63_decontaminate", plan)
    assert(unallowedHits.isEmpty, unallowedHits)
  }

  test("a deliberately-unpinned decon plan is flagged MissingBroadcast") {
    // same join shape, NO broadcast hint, auto-threshold disabled: the
    // exact plan the decon contract forbids (corpus-side shuffle)
    val unpinned = spark.sessionState.conf
    val prior = unpinned.getConfString("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val corpusGrams = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("__g"))
      val evalGrams = eval.select(
        explode(split(col("text"), " ")).as("__g")).distinct()
      val plan = corpusGrams.join(evalGrams, Seq("__g"), "left_semi")
        .select("doc_id").distinct()
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"), plan)
      val (_, unallowedHits) =
        PlanLint.planFindings("q63_decontaminate", plan)
      assert(unallowedHits.exists(_.startsWith("MissingBroadcast")),
        s"lint must flag the flipped plan, got: $unallowedHits")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("queries without a broadcast contract are not held to one") {
    val (_, unallowedHits) =
      PlanLint.planFindings("q01_pricing_summary", "SortMergeJoin only")
    assert(unallowedHits.isEmpty)
  }
}
