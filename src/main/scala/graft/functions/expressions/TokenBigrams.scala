package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native adjacent-pair extraction: array<string> →
  * array<struct<t1 string, t2 string>>, one entry per adjacent token
  * pair in document order (n−1 entries for an n-token array, empty for
  * n ≤ 1).
  *
  * This is the row-local kernel behind the bigram-LM operators in
  * [[graft.operators.QualityModels]]. The composed alternatives all
  * lose at scale: `zip_with(slice, slice, …)` is a higher-order
  * function (interpreted comparator per element — the same disease
  * [[TokenCounts]]'s scaladoc documents for ArraySort), and a
  * posexplode + self-join re-shuffles the whole token stream just to
  * pair neighbours that were already adjacent in the row. One compiled
  * pass per row keeps pairing where the data is.
  *
  * Null array → null; null elements (which TextFunctions.tokens never
  * produces) would propagate as nulls in the struct and are instead
  * skipped pairwise — a pair is emitted only when both sides are
  * non-null, keeping the output fields non-nullable. */
case class TokenBigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(TokenBigrams.entryType,
    containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_token_bigrams"

  override protected def nullSafeEval(a: Any): Any =
    TokenBigrams.pairs(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = " +
      s"graft.functions.expressions.TokenBigrams.pairs($a);")

  override protected def withNewChildInternal(
      newChild: Expression): TokenBigrams = copy(child = newChild)
}

object TokenBigrams {
  val entryType: StructType = StructType(Seq(
    StructField("t1", StringType, nullable = false),
    StructField("t2", StringType, nullable = false)))

  def pairs(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      if (!a.isNullAt(i) && !a.isNullAt(i + 1))
        out.add(InternalRow(a.getUTF8String(i), a.getUTF8String(i + 1)))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
