package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native form of Dedup.simhashFromHashes: given the token-hash array,
  * compute the whole `coeffs.length`-bit signature in ONE pass — per
  * token, one universal hash + counter update per bit — instead of one
  * higher-order `aggregate` traversal per bit (32 array walks per row).
  * Bit-equal to the composed form (parity-tested); the codegen path calls
  * a JIT-friendly static kernel with the coefficient tables attached as
  * reference objects.
  */
case class PortableSimHash(child: Expression, as: Array[Long], bs: Array[Long])
  extends UnaryExpression {

  require(as.length == bs.length && as.nonEmpty && as.length <= 63,
    "1..63 coefficient pairs")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    PortableSimHash.signature(input.asInstanceOf[ArrayData], as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("simhashAs", as, "long[]")
    val bRef = ctx.addReferenceObj("simhashBs", bs, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.PortableSimHash.signature($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PortableSimHash =
    copy(child = newChild)
}

object PortableSimHash {
  final val Mod = 1000000007L

  /** One pass over the token hashes: counters[bit] += ±1 by
    * ((a·h + b) mod p) parity; sign packs the bit. */
  def signature(hv: ArrayData, as: Array[Long], bs: Array[Long]): Long = {
    val nBits = as.length
    val counters = new Array[Long](nBits)
    val n = hv.numElements()
    var i = 0
    while (i < n) {
      val h = hv.getLong(i)
      var bit = 0
      while (bit < nBits) {
        val u = ((as(bit) % Mod) * (h % Mod) + bs(bit)) % Mod
        counters(bit) += (if ((u & 1L) == 1L) 1L else -1L)
        bit += 1
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < nBits) {
      if (counters(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }
}
