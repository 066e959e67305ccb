package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Apply an ordered list of literal (pattern → replacement) string
  * rewrites — [[graft.operators.Bpe]]'s merge-application kernel.
  *
  * Semantically identical to folding the table into nested
  * `replace(replace(...))` calls (Java and DuckDB literal replace are
  * both greedy left-to-right non-overlapping), but ONE expression node
  * deep regardless of table size: the nested form burns several stack
  * frames per merge in Column/Catalyst tree recursion and overflows
  * the default JVM stack below a 512-row table (measured), which is
  * useless for a tokenizer whose production tables have tens of
  * thousands of merges. The loop lives in compiled code; the DuckDB
  * oracle keeps the chained-replace form, whose round count the
  * unrolled SQL bounds anyway. */
case class ApplyMerges(child: Expression,
                       patterns: Seq[String],
                       replacements: Seq[String])
  extends UnaryExpression {

  require(patterns.length == replacements.length,
    "patterns and replacements must align")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_apply_merges"

  private lazy val pats = patterns.toArray
  private lazy val reps = replacements.toArray

  override protected def nullSafeEval(s: Any): Any =
    ApplyMerges.run(s.asInstanceOf[UTF8String], pats, reps)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("pats", pats, "java.lang.String[]")
    val r = ctx.addReferenceObj("reps", reps, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = " +
      s"graft.functions.expressions.ApplyMerges.run($s, $p, $r);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): ApplyMerges = copy(child = newChild)
}

object ApplyMerges {
  def run(s: UTF8String, pats: Array[String],
          reps: Array[String]): UTF8String = {
    var t = s.toString
    var i = 0
    while (i < pats.length) {
      t = t.replace(pats(i), reps(i))
      i += 1
    }
    UTF8String.fromString(t)
  }
}
