package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature: given the shingle-hash array, compute the
  * minimum of every universal hash function in ONE traversal (per
  * element: k hash evaluations, k running minima) instead of one
  * array_min(transform(...)) pass per function. Returns array<bigint> of
  * length `as.length`. Bit-equal to the composed column program
  * (parity-tested). */
case class PortableMinHash(child: Expression, as: Array[Long], bs: Array[Long])
  extends UnaryExpression {

  require(as.length == bs.length && as.nonEmpty, "coefficient pairs required")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any =
    PortableMinHash.minima(input.asInstanceOf[ArrayData], as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.PortableMinHash.minima($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PortableMinHash =
    copy(child = newChild)
}

object PortableMinHash {
  final val Mod = 1000000007L

  /** Empty input yields all-null minima — matching
    * `array_min(transform(empty, ...))` = NULL per function. */
  def minima(hv: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val k = as.length
    val n = hv.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k))
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hv.getLong(i)
      var f = 0
      while (f < k) {
        val u = (as(f) * h + bs(f)) % Mod
        if (u < mins(f)) mins(f) = u
        f += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(Long.box(_): Any))
  }
}
