package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The check/assertion engine: declarative check specs compiled onto a
  * staged DataFrame, producing the reference's Check row shape
  * (SURVEY §1.1, §2.10; service/check.py:27-57).
  *
  * Each check is a trio of Columns (valid?, value, error) evaluated over
  * the same scan; `run` unions them via a single generator expression
  * (explode over an array of check structs) so N checks cost one pass
  * over the data — the reference evaluates checks one document at a time
  * in Python (metatags.py:48-61).
  */
object Checks {

  /** One check: name + columns computed against the input row. */
  final case class Spec(
      name: String,
      valid: Column,
      value: Column,
      diff: Column = lit(""),
      error: Column = lit(""))

  /** Compile specs over `df`: output columns
    * (check, valid, value, diff, error) + the passthrough `keyCols`.
    * One projection + one explode — no per-check scans, no shuffle. */
  def run(df: DataFrame, specs: Seq[Spec], keyCols: Seq[String]): DataFrame = {
    val checkStructs = array(specs.map { s =>
      struct(
        lit(s.name).as("check"),
        s.valid.cast("boolean").as("valid"),
        s.value.cast("string").as("value"),
        s.diff.cast("string").as("diff"),
        s.error.cast("string").as("error"))
    }: _*)
    df.select(keyCols.map(col) :+ explode(checkStructs).as("__c"): _*)
      .select(keyCols.map(col) :+
        col("__c.check") :+ col("__c.valid") :+ col("__c.value") :+
        col("__c.diff") :+ col("__c.error"): _*)
  }

  /** Threshold check family (pagespeed-style, operation/pagespeed.py:148-524):
    * metric >= threshold (scores) or <= threshold (display values). */
  def atLeast(name: String, metric: Column, threshold: Double): Spec =
    Spec(name, metric >= threshold, metric)

  def atMost(name: String, metric: Column, threshold: Double): Spec =
    Spec(name, metric <= threshold, metric)

  /** Equality check vs an asserted value (responseheader family). */
  def equalsCheck(name: String, actual: Column, asserted: Column): Spec =
    Spec(name, actual === asserted, actual,
      error = when(actual =!= asserted,
        concat(lit("expected "), asserted.cast("string"))).otherwise(lit("")))

  /** Alerting-check whole-result mode (alerting_check.py:197-231):
    * rowcount>0 fires (or ==0 when negate). Returns a 1-row DataFrame
    * {results_count, alert} — count is an aggregate, no collect. */
  def countAlert(result: DataFrame, negate: Boolean = false): DataFrame = {
    val agg = result.agg(count(lit(1)).as("results_count"))
    agg.withColumn("alert",
      if (negate) col("results_count") === 0 else col("results_count") > 0)
  }
}
