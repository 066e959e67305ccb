package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row token run-length count: array<string> →
  * array<struct<tok string, c long>>, one entry per distinct element,
  * entries sorted by token (binary order — deterministic output).
  *
  * This is [[graft.operators.CorpusStats]]'s row-local dedup kernel.
  * The composed higher-order form (array_sort + filter + transform)
  * has the right SHAPE — no aggregation state, nothing shuffled — but
  * Spark's lambda functions are interpreted (`ArraySort`'s comparator
  * walks an If/LessThan expression tree per comparison; measured
  * dominant in the 10M-doc vocabulary probe's stacks). One compiled
  * pass with a small hash map per row keeps the shape and removes the
  * interpreter: same trade [[DotProduct]] makes for the ANN kernels.
  *
  * Null array → null; null elements are skipped (TextFunctions.tokens
  * never produces them). */
case class TokenCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(TokenCounts.entryType,
    containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_token_counts"

  override protected def nullSafeEval(a: Any): Any =
    TokenCounts.count(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = " +
      s"graft.functions.expressions.TokenCounts.count($a);")

  override protected def withNewChildInternal(
      newChild: Expression): TokenCounts = copy(child = newChild)
}

object TokenCounts {
  val entryType: StructType = StructType(Seq(
    StructField("tok", StringType, nullable = false),
    StructField("c", LongType, nullable = false)))

  /** One compiled pass: count into a hash map, emit entries sorted by
    * token binary order. */
  def count(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val m = new java.util.HashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val t = a.getUTF8String(i)
        val slot = m.get(t)
        if (slot == null) m.put(t, Array(1L)) else slot(0) += 1L
      }
      i += 1
    }
    val toks = m.keySet().toArray(new Array[UTF8String](m.size()))
    java.util.Arrays.sort(toks.asInstanceOf[Array[Object]])
    val out = new Array[Any](toks.length)
    var j = 0
    while (j < toks.length) {
      out(j) = InternalRow(toks(j), m.get(toks(j))(0))
      j += 1
    }
    new GenericArrayData(out)
  }
}
