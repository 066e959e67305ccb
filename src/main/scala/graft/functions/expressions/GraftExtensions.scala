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
      }),
    (FunctionIdentifier("graft_normalize_text"),
      new ExpressionInfo(classOf[NormalizeText].getName,
        "graft_normalize_text"),
      (children: Seq[Expression]) => {
        // (text[, stripAccents[, lower]]) — flags must be literal booleans
        require(children.nonEmpty && children.size <= 3,
          "graft_normalize_text takes (text[, stripAccents[, lower]])")
        def flag(i: Int, default: Boolean): Boolean =
          if (children.size <= i) default
          else children(i) match {
            case org.apache.spark.sql.catalyst.expressions
              .Literal(b: Boolean, org.apache.spark.sql.types.BooleanType) => b
            case other => throw new IllegalArgumentException(
              s"graft_normalize_text flag ${i + 1} must be a boolean literal, got $other")
          }
        NormalizeText(org.apache.spark.sql.catalyst.expressions.Cast(
          children.head, org.apache.spark.sql.types.StringType),
          stripAccents = flag(1, default = true), lower = flag(2, default = true))
      }))

  /** Register on an existing session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
