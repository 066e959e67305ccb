package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's row-level comparison DSL, compiled to a Catalyst
  * `Column` predicate instead of per-row Python string formatting.
  *
  * Reference semantics (/root/reference/utilities/parsing.py:4-55, used by
  * modules/aggregation/custom/alerting_check.py:182):
  *   - a template like `"{column} >= 10"`; `{name}` refers to a row field,
  *   - operators: == != > < >= <=,
  *   - literal coercion: int, float, bool ("true"/"false" any case),
  *     "null"/"none" → NULL, `_empty` → empty string, anything else →
  *     bare string,
  *   - a single token that is a boolean column/literal passes through,
  *   - malformed expression → SyntaxError (here: IllegalArgumentException).
  *
  * The reference formats + re-parses the template per row; compiling once
  * to a `Column` lets whole-stage codegen evaluate it — the per-row cost
  * is a comparison, not a parse, which is the difference between "works on
  * a urlset" and "works on 100 TB of rows".
  */
object CheckDsl {

  private val Ops = Set("==", "!=", ">", "<", ">=", "<=")

  private val ColumnRef = """\{([A-Za-z0-9_.]+)\}""".r

  /** Compile one comparison template to a boolean Column. */
  def compile(template: String): Column = {
    val tokens = template.trim.split("\\s+").toList.filter(_.nonEmpty)
    tokens match {
      case left :: op :: right :: Nil if Ops.contains(op) =>
        applyOp(term(left), op, term(right))
      case single :: Nil =>
        // single-token form: a boolean column or literal passes through
        term(single).cast("boolean")
      case _ =>
        throw new IllegalArgumentException(
          s"malformed comparison expression: '$template'")
    }
  }

  /** A term is either a {column} reference or a literal with the
    * reference's coercion ladder (int, float, bool, null, _empty, string). */
  private[functions] def term(tok: String): Column = tok match {
    case ColumnRef(name) => col(name)
    case "_empty"        => lit("")
    case t if t.equalsIgnoreCase("null") || t.equalsIgnoreCase("none") =>
      lit(null)
    case t if t.equalsIgnoreCase("true")  => lit(true)
    case t if t.equalsIgnoreCase("false") => lit(false)
    case t =>
      toLongOption(t).map(lit(_))
        .orElse(toDoubleOption(t).map(lit(_)))
        .getOrElse(lit(t))
  }

  private def toLongOption(s: String): Option[Long] =
    try Some(java.lang.Long.parseLong(s)) catch { case _: NumberFormatException => None }

  private def toDoubleOption(s: String): Option[Double] =
    try Some(java.lang.Double.parseDouble(s)) catch { case _: NumberFormatException => None }

  /** `==`/`!=` are null-safe: the reference formats the row value into the
    * template and compares with Python `==`, where `None == None` is True
    * and `None == 5` is False (/root/reference/utilities/parsing.py:23-55).
    * Catalyst `===` would return NULL for `{col} == null`, so the check
    * could never pass; `<=>` (eqNullSafe) reproduces Python semantics. */
  private def applyOp(l: Column, op: String, r: Column): Column = op match {
    case "==" => l <=> r
    case "!=" => !(l <=> r)
    case ">"  => l > r
    case "<"  => l < r
    case ">=" => l >= r
    case "<=" => l <= r
  }

  /** The reference's regex capture-group substitution: output template
    * `"x$1"` where `$n` is replaced by regex group n of `input`, with a
    * literal fallback when the pattern does not match
    * (/root/reference/modules/operation/custom/google_search_console.py:34,368-386).
    * Compiled to nested concat/regexp_extract — stays in codegen. */
  def regexTemplate(input: Column, pattern: String, output: String,
                    fallback: Option[String] = None): Column = {
    val GroupRef = """\$(\d+)""".r
    val parts = GroupRef.pattern.split(output, -1).map(lit(_))
    val groups = GroupRef.findAllMatchIn(output).map(_.group(1).toInt).toSeq
    val interleaved: Seq[Column] =
      parts.toIndexedSeq.zipWithIndex.flatMap { case (p, i) =>
        if (i < groups.length) Seq(p, regexp_extract(input, pattern, groups(i)))
        else Seq(p)
      }
    val rendered = concat(interleaved: _*)
    val matched = input.rlike(pattern)
    fallback match {
      case Some(f) => when(matched, rendered).otherwise(lit(f))
      case None    => when(matched, rendered).otherwise(input)
    }
  }
}
