package graft.functions.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Native probes over broadcast sketches — the codegen replacements for
  * the Scala-UDF filters [[graft.operators.Sketches]] originally used.
  *
  * The UDF forms were correct and bounded (the sketch guards the
  * exchange, it doesn't sit in one) but paid the interpreted-fallback
  * tax on the WHOLE pass-2 scan: a Scala UDF converts every row's value
  * out of Tungsten format and breaks the surrounding WholeStageCodegen
  * span — the same genus as the composed-ADC fallback that measured
  * ~10× ([[AdcDot]]). These expressions stay inside generated code: one
  * virtual call per row against the broadcast-held sketch, operating
  * directly on the UTF8String's UTF-8 bytes (exactly the bytes both
  * sketch builders hash — `count_min_sketch` adds
  * `UTF8String.getBytes` and `stat.bloomFilter` likewise, so estimates
  * are bit-identical to the String-boxing UDF path).
  *
  * Both return non-null booleans: a NULL input can't be a member /
  * heavy (the builders skip nulls), so it maps to `false` rather than
  * NULL — the filter semantics the UDF forms (`v != null && …`) pinned.
  */
private[graft] trait SketchProbe extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  /** The per-row probe over non-null UTF-8 bytes. */
  protected def probe(bytes: Array[Byte]): Boolean

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && probe(v.asInstanceOf[UTF8String].getBytes)
  }
}

/** `estimateCount(value) >= threshold` over a broadcast count-min
  * sketch — the pass-2 candidate filter of
  * [[graft.operators.Sketches.heavyHitters]]. Over-estimate-only
  * semantics make `false` a proof of "not heavy". */
case class CmsEstimateGte(child: Expression,
                          bc: Broadcast[CountMinSketch],
                          threshold: Long)
  extends SketchProbe {

  override def prettyName: String = "graft_cms_estimate_gte"

  @transient private lazy val sketch: CountMinSketch = bc.value
  override protected def probe(bytes: Array[Byte]): Boolean =
    sketch.estimateCount(bytes) >= threshold

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val bcRef = ctx.addReferenceObj("cmsBc", bc,
      "org.apache.spark.broadcast.Broadcast")
    val sk = ctx.addMutableState(
      "org.apache.spark.util.sketch.CountMinSketch", "cms",
      v => s"$v = (org.apache.spark.util.sketch.CountMinSketch)" +
        s" $bcRef.value();")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.value} = false;
      if (!${c.isNull}) {
        ${ev.value} = $sk.estimateCount(${c.value}.getBytes())
          >= ${threshold}L;
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CmsEstimateGte = copy(child = newChild)
}

/** `mightContain(value)` over a broadcast bloom filter — the pre-filter
  * of [[graft.operators.Sketches.bloomSemiJoin]] /
  * [[graft.operators.Sketches.bloomAntiJoin]]. No-false-negative
  * semantics make `false` a proof of absence. */
case class BloomMightContainValue(child: Expression,
                                  bc: Broadcast[BloomFilter])
  extends SketchProbe {

  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val filter: BloomFilter = bc.value
  override protected def probe(bytes: Array[Byte]): Boolean =
    filter.mightContainBinary(bytes)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val bcRef = ctx.addReferenceObj("bloomBc", bc,
      "org.apache.spark.broadcast.Broadcast")
    val bf = ctx.addMutableState(
      "org.apache.spark.util.sketch.BloomFilter", "bloom",
      v => s"$v = (org.apache.spark.util.sketch.BloomFilter)" +
        s" $bcRef.value();")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.value} = false;
      if (!${c.isNull}) {
        ${ev.value} = $bf.mightContainBinary(${c.value}.getBytes());
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BloomMightContainValue = copy(child = newChild)
}
