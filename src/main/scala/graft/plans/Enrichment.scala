package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The GSC "matching" enrichment operation (SURVEY §2.10 tail): drop
  * excluded input columns (never `date`), then per match rule derive an
  * output column from regex capture-group templates and/or CSV
  * contains-lookups, with a fallback for rows nothing matched.
  *
  * Reference: /root/reference/modules/operation/custom/google_search_console.py:327-386
  * + config/matches.example.csv (column-major: header = output label, the
  * column's cells = substrings to match).
  *
  * Faithful quirks:
  *  - expressions apply IN ORDER and later matches OVERWRITE earlier ones
  *    (the pandas `.loc` assignment loop) — so the compiled `when` chain
  *    folds with later rules outermost, NOT first-match-wins;
  *  - regex templates substitute only groups the pattern actually has;
  *    references to missing groups stay literal (the IndexError pass);
  *  - the fallback replaces only still-empty outputs at the end.
  *
  * Everything compiles to one codegen'd projection — no UDFs, no shuffle.
  */
object Enrichment {

  sealed trait Expression
  final case class RegexExpr(pattern: String, output: String) extends Expression
  /** columns: (outputLabel, matchValues) in CSV column order. */
  final case class CsvExpr(columns: Seq[(String, Seq[String])],
                           caseSensitive: Boolean = true,
                           useRegex: Boolean = false) extends Expression

  final case class MatchRule(inputField: String, outputField: String,
                             fallback: String, expressions: Seq[Expression])

  def enrich(df: DataFrame, excludeInputFields: Seq[String],
             rules: Seq[MatchRule]): DataFrame = {
    val dropped = excludeInputFields.filter(_ != "date")
      .foldLeft(df)((acc, c) => acc.drop(c))
    rules.foldLeft(dropped) { (acc, rule) =>
      val input = col(rule.inputField)
      val value = rule.expressions.foldLeft(lit("")) { (current, e) =>
        e match {
          case RegexExpr(pattern, output) =>
            when(input.rlike(pattern),
              renderRegexTemplate(input, pattern, output)).otherwise(current)
          case CsvExpr(columns, caseSensitive, useRegex) =>
            columns.foldLeft(current) { case (cur, (label, values)) =>
              val cond = values.map { v =>
                if (useRegex) {
                  val p = if (caseSensitive) v else s"(?i)$v"
                  input.rlike(p)
                } else if (caseSensitive) input.contains(v)
                else lower(input).contains(v.toLowerCase)
              }.reduce(_ || _)
              when(cond, lit(label)).otherwise(cur)
            }
        }
      }
      val withFallback =
        if (rule.fallback.nonEmpty) when(value === "", lit(rule.fallback)).otherwise(value)
        else value
      acc.withColumn(rule.outputField, withFallback)
    }
  }

  /** `$n` template substitution, groups beyond the pattern's count left
    * literal (reference IndexError pass). */
  private[plans] def renderRegexTemplate(input: Column, pattern: String,
                                         output: String): Column = {
    val nGroups = java.util.regex.Pattern.compile(pattern)
      .matcher("").groupCount()
    val Ref = """\$(\d+)""".r
    val parts = Ref.pattern.split(output, -1)
    val refs = Ref.findAllMatchIn(output).map(_.group(1).toInt).toSeq
    val pieces: Seq[Column] = parts.toIndexedSeq.zipWithIndex.flatMap { case (p, i) =>
      val litPart = if (p.nonEmpty) Seq(lit(p)) else Seq.empty[Column]
      if (i < refs.length) {
        val g = refs(i)
        if (g <= nGroups) litPart :+ regexp_extract(input, pattern, g)
        else litPart :+ lit("$" + g)  // missing group stays literal
      } else litPart
    }
    if (pieces.isEmpty) lit("") else concat(pieces: _*)
  }

  /** Column-major matches CSV (config/matches.example.csv): header row =
    * output labels, each column's cells = match substrings. */
  def loadMatchesCsv(text: String): Seq[(String, Seq[String])] = {
    val rows = text.linesIterator.filter(_.trim.nonEmpty).toSeq
      .map(_.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq)
    val headers = rows.head
    headers.indices.map { c =>
      headers(c) -> rows.tail.flatMap(r => r.lift(c)).filter(_.nonEmpty)
    }
  }
}
