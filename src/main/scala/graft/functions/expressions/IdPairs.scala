package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native in-group candidate pair generation: given a sorted array of
  * ids, emit every (i < j) combination as struct<id_a, id_b>.
  *
  * Same motivation as [[HammingPairs]]: the composed nested
  * transform-over-slice copies an O(n) array per element — O(n²)
  * element copies per group on top of the O(n²) output — while this
  * kernel allocates exactly one small struct per emitted pair. The
  * output is still inherently quadratic in the group size; the df /
  * bucket caps remain the real scale guard. */
case class IdPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_id_pairs"

  override protected def nullSafeEval(input: Any): Any =
    IdPairs.pairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.IdPairs.pairs($c)")

  override protected def withNewChildInternal(newChild: Expression): IdPairs =
    copy(child = newChild)
}

object IdPairs {
  def pairs(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    val v = new Array[Long](n)
    var i = 0
    while (i < n) { v(i) = ids.getLong(i); i += 1 }
    val out = new Array[Any](if (n < 2) 0 else n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](v(i), v(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
