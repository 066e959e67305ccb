package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge. Spark 4 moved these conversions behind
  * `private[sql] classic.ExpressionUtils`; the methods are stable public
  * bytecode, so a cached reflective handle gives library code (custom
  * native expressions like [[PolyHash]]) a supported-enough path without
  * declaring classes inside Spark's namespace. Driver-side only — the
  * reflection happens at plan construction, never per row. */
object ColumnBridge {
  private val cls =
    Class.forName("org.apache.spark.sql.classic.ExpressionUtils")
  private val toColumn =
    cls.getMethod("column", classOf[Expression])
  private val toExpression =
    cls.getMethod("expression", classOf[Column])

  def column(e: Expression): Column =
    toColumn.invoke(null, e).asInstanceOf[Column]

  def expression(c: Column): Expression =
    toExpression.invoke(null, c).asInstanceOf[Expression]

  /** The native rolling hash as a Column function. */
  def polyHash(c: Column): Column = column(PolyHash(expression(c)))

  /** Unicode canonicalization as a Column function. */
  def normalizeText(c: Column, stripAccents: Boolean, lower: Boolean): Column =
    column(NormalizeText(expression(c), stripAccents, lower))

  /** Native per-row token run-length count as a Column function. */
  def tokenCounts(c: Column): Column = column(TokenCounts(expression(c)))

  /** Native adjacent-token-pair extraction as a Column function. */
  def tokenBigrams(c: Column): Column = column(TokenBigrams(expression(c)))

  /** Ordered literal-replace chain (BPE merge application) as a Column
    * function. */
  def applyMerges(c: Column, patterns: Seq[String],
                  replacements: Seq[String]): Column =
    column(ApplyMerges(expression(c), patterns, replacements))
}
