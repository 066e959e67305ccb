package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native in-bucket near-dup pair generation: given a sorted
  * array<struct<id: long, sig: long>> bucket, emit every (i < j) pair
  * whose signature Hamming distance is ≤ `maxDist`.
  *
  * The composed form — nested `transform` over `slice` plus an array
  * `filter` — copies an O(n) struct array per element (O(n²) allocations
  * per bucket), which dominates wall time once a bucket holds thousands
  * of near-identical signatures (adversarial corpora: 90 %-duplicate
  * variant sets). This kernel is two primitive arrays and an XOR+popcount
  * loop; it allocates only for matches. Bit-equal to the composed form
  * (parity-tested in HammingPairsSpec). */
case class HammingPairs(child: Expression, maxDist: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("hamming", IntegerType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_hamming_pairs"

  override protected def nullSafeEval(input: Any): Any =
    HammingPairs.pairs(input.asInstanceOf[ArrayData], maxDist)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.HammingPairs.pairs($c, $maxDist)")

  override protected def withNewChildInternal(newChild: Expression): HammingPairs =
    copy(child = newChild)
}

object HammingPairs {
  def pairs(ms: ArrayData, maxDist: Int): ArrayData = {
    val n = ms.numElements()
    val ids = new Array[Long](n)
    val sigs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = ms.getStruct(i, 2)
      ids(i) = r.getLong(0)
      sigs(i) = r.getLong(1)
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val h = java.lang.Long.bitCount(sigs(i) ^ sigs(j))
        if (h <= maxDist)
          out += new GenericInternalRow(Array[Any](ids(i), ids(j), h))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
