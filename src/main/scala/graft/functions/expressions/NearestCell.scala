package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native IVF cell assignment: argmin-L2 over a centroid matrix held as
  * a plan-level reference object — ONE narrow map over the corpus, no
  * corpus×cells row explosion, no aggregation.
  *
  * Why not the broadcast-join + min_by form: an aggregation whose buffer
  * carries the vector (`first(cv)`) or a struct ordering is
  * ObjectHashAggregate, and its sort-based fallback (128-key threshold)
  * SORTS the exploded corpus×cells product with full payloads — measured
  * at 1M×256 on local[32]: ~200 GB of spill, disk-full abort. The
  * centroid matrix is ≤ a few MB for any sane cell count, so it rides
  * the plan like the LSH planes do and the assignment stays inside
  * whole-stage codegen.
  *
  * Distances use the same left-to-right fold as [[DotProduct.l2sq]]
  * (bit-equal to the composed form the DuckDB oracle mirrors); ties take
  * the smallest cell id — both matching the previous
  * min_by(cell, struct(l2Sq, cell)) semantics exactly.
  *
  * Returns null for a null vector, a dimension mismatch, or a null
  * element (the min_by form dropped such rows from the aggregate; the
  * caller filters nulls to keep that shape). */
case class NearestCell(child: Expression, cents: Array[Double],
                       cellIds: Array[Int], dim: Int)
  extends UnaryExpression {

  require(dim > 0 && cents.length == cellIds.length * dim,
    s"centroid matrix ${cents.length} != ${cellIds.length} cells x $dim")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_cell"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    NearestCell.nearest(input.asInstanceOf[ArrayData], cents, cellIds, dim,
      isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCents", cents, "double[]")
    val idRef = ctx.addReferenceObj("ivfCellIds", cellIds, "int[]")
    val f = isFloat
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("cellRes")
      s"""
         |Object $r = graft.functions.expressions.NearestCell.nearest($v, $cRef, $idRef, $dim, $f);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Integer) $r).intValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

object NearestCell {
  /** Centroids ordered by ascending cell id so the strict-< scan returns
    * the SMALLEST cell id on distance ties. */
  def nearest(v: ArrayData, cents: Array[Double], cellIds: Array[Int],
              dim: Int, vFloat: Boolean): java.lang.Integer = {
    if (v.numElements() != dim) return null
    val x = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j)) return null
      x(j) = if (vFloat) v.getFloat(j).toDouble else v.getDouble(j)
      j += 1
    }
    var best = -1
    var bestD = Double.PositiveInfinity
    val cells = cellIds.length
    var c = 0
    while (c < cells) {
      val off = c * dim
      var acc = 0.0
      var i = 0
      while (i < dim) {
        val d = x(i) - cents(off + i)
        acc = acc + d * d
        i += 1
      }
      if (acc < bestD) { bestD = acc; best = c }
      c += 1
    }
    if (best < 0) null else Int.box(cellIds(best))
  }
}
