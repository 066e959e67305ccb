package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst form of the engine's portable rolling hash
  * (acc·31 + codepoint, mod 1e9+7 — TextFunctions.fingerprint /
  * Dedup.polyHash): same value, but evaluated as one tight codegen loop
  * instead of the composed sequence/transform/aggregate higher-order
  * chain, which materializes an index array and a lambda frame per row.
  * On hashing-heavy pipelines (fingerprinting, portable MinHash/SimHash)
  * this is the difference between ~100 MB/s/core and ~1 GB/s/core.
  *
  * Registered as SQL function `graft_poly_hash` via [[GraftExtensions]]
  * (SparkSessionExtensions) or [[GraftFunctions.register]].
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  // input typing is enforced by the function builder (wraps the argument
  // in Cast(_, StringType)); ExpectsInputTypes isn't usable outside the
  // sql package (AbstractDataType is private[sql])
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.PolyHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val Mod = 1000000007L

  /** Iterates CODEPOINTS (matching `ascii(substr(s, i, 1))` semantics of
    * the composed column program, incl. for supplementary characters). */
  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      acc = (acc * 31L + cp) % Mod
    }
    acc
  }
}
