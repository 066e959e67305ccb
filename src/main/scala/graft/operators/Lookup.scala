package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's lookup/classification join (SURVEY §2.4 "Lookup/
  * classification join"): a match table maps an output label to a list of
  * substrings; a row gets the label of the FIRST rule whose any value is
  * contained in the input field, else the fallback.
  *
  * Reference: /root/reference/modules/operation/custom/google_search_console.py:327-371
  * (CSV loaded at :190-201, example config/matches.example.csv:1-4), with a
  * case-sensitivity flag at :358-364.
  *
  * Compiled to a `when` chain over codegen'd `contains` — for rule tables
  * of CSV size (tens of labels) this stays in whole-stage codegen and
  * never shuffles, which beats a broadcast join of exploded rules at any
  * scale. For very large rule sets use [[classifyJoin]].
  */
object Lookup {

  /** (label, substrings) rules — order = priority. */
  def classify(input: Column, rules: Seq[(String, Seq[String])],
               caseSensitive: Boolean = true,
               fallback: String = ""): Column = {
    def contains(v: String): Column =
      if (caseSensitive) input.contains(v)
      else lower(input).contains(v.toLowerCase)
    rules.foldLeft(Option.empty[Column]) { case (acc, (label, values)) =>
      val cond = values.map(contains).reduce(_ || _)
      Some(acc match {
        case None    => when(cond, lit(label))
        case Some(c) => c.when(cond, lit(label))
      })
    }.map(_.otherwise(lit(fallback))).getOrElse(lit(fallback))
  }

  /** Join-based variant for rule sets too large for a when-chain: explode
    * the rules to (label, value, priority), broadcast, join on contains,
    * keep the best-priority match per row. */
  def classifyJoin(df: DataFrame, idCol: String, inputCol: String,
                   rules: DataFrame, fallback: String = ""): DataFrame = {
    // rules: (label string, value string, priority int)
    val matched = df.join(broadcast(rules),
        col(inputCol).contains(col("value")), "left")
      .groupBy(col(idCol))
      .agg(min_by(col("label"), struct(col("priority"), col("label"))).as("label"))
    df.join(matched, Seq(idCol), "left")
      .withColumn("label", coalesce(col("label"), lit(fallback)))
  }
}
