package graft.functions.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The engine's native SQL functions, exposed to the S9/S10 `spark.sql`
  * surface so query-as-source configs can call them directly.
  *
  * Wire either at session build time —
  * `spark.sql.extensions=graft.functions.expressions.GraftExtensions` —
  * or onto a live session with [[GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(e.injectFunction)
}

object GraftFunctions {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val all: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("graft_poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_poly_hash"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_poly_hash takes one argument")
        PolyHash(org.apache.spark.sql.catalyst.expressions.Cast(
          children.head, org.apache.spark.sql.types.StringType))
      }))

  /** Register on an existing session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
