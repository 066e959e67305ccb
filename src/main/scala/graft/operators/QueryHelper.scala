package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The S9 query-as-source machinery (SURVEY §2.1 S9): named scalar
  * parameters with the reference's type ladder — string/int/float plus the
  * dynamic `dateDaysAgo: n` → today-n — and the nested-aware
  * `columnMapping` rename.
  *
  * Reference: /root/reference/service/bigquery/query_helper.py:58-85
  * (parameters) and :87-156 (recursive rename through RECORD fields and
  * repeated records).
  */
object QueryHelper {

  final case class InvalidDynamicParameter(msg: String)
    extends RuntimeException(msg)

  /** Run `sql` with named parameters (`:name` markers — Spark's native
    * named-parameter API, replacing BigQuery's @name). */
  def runQuery(spark: SparkSession, sql: String,
               parameters: Map[String, Any] = Map.empty): DataFrame =
    spark.sql(sql, processParameters(parameters))

  /** The reference's parameter coercion ladder (query_helper.py:58-85). */
  private[graft] def processParameters(params: Map[String, Any]): Map[String, Any] =
    params.map {
      case (k, v: String) => k -> v
      case (k, v: Int) => k -> Int.box(v)
      case (k, v: Long) => k -> Long.box(v)
      case (k, v: Double) => k -> Double.box(v)
      case (k, v: Map[String @unchecked, Any @unchecked]) =>
        v.toSeq match {
          case Seq(("dateDaysAgo", n: Int)) =>
            k -> java.sql.Date.valueOf(java.time.LocalDate.now().minusDays(n.toLong))
          case _ =>
            throw InvalidDynamicParameter(
              "Invalid dynamic parameter, could not be properly processed")
        }
      case (k, v) =>
        throw InvalidDynamicParameter(s"unsupported parameter type for '$k': $v")
    }

  /** Nested-aware column rename: mapping keys are dotted paths
    * ("top", "record.field", "record.sub.field"); renames apply inside
    * structs and arrays of structs (query_helper.py:87-156). Unmatched
    * paths are ignored, like the reference. */
  def renameColumns(df: DataFrame, mapping: Map[String, String]): DataFrame = {
    if (mapping.isEmpty) return df
    val cols = df.schema.fields.map { f =>
      val renamed = mapping.getOrElse(f.name, f.name)
      val childMapping = scoped(mapping, f.name)
      rebuild(col(f.name), f.dataType, childMapping).as(renamed)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** mapping entries under `prefix.`, with the prefix stripped. */
  private def scoped(mapping: Map[String, String], prefix: String): Map[String, String] =
    mapping.collect {
      case (k, v) if k.startsWith(prefix + ".") =>
        k.substring(prefix.length + 1) -> v
    }

  private def rebuild(c: Column, dt: DataType, mapping: Map[String, String]): Column =
    dt match {
      case _ if mapping.isEmpty => c
      case st: StructType =>
        struct(st.fields.map { f =>
          val renamed = mapping.getOrElse(f.name, f.name)
          rebuild(c.getField(f.name), f.dataType, scoped(mapping, f.name)).as(renamed)
        }.toIndexedSeq: _*)
      case ArrayType(elem: StructType, _) =>
        transform(c, x => struct(elem.fields.map { f =>
          val renamed = mapping.getOrElse(f.name, f.name)
          rebuild(x.getField(f.name), f.dataType, scoped(mapping, f.name)).as(renamed)
        }.toIndexedSeq: _*))
      case _ => c
    }

  /** `"{name}"` message templates → a Column that renders the template
    * with row values substituted (the reference's `message.format(**row)`,
    * alerting_check.py:182,196). Unknown fields raise at compile time. */
  def renderTemplate(template: String, columns: Set[String]): Column = {
    val Ref = """\{([A-Za-z0-9_.]+)\}""".r
    val parts = Ref.pattern.split(template, -1)
    val refs = Ref.findAllMatchIn(template).map(_.group(1)).toSeq
    refs.find(r => !columns.contains(r)).foreach { missing =>
      throw new IllegalArgumentException(
        s"template references unknown column '$missing'")
    }
    val pieces: Seq[Column] = parts.toIndexedSeq.zipWithIndex.flatMap { case (p, i) =>
      val litPart = if (p.nonEmpty) Seq(lit(p)) else Seq.empty
      if (i < refs.length)
        litPart :+ coalesce(col(refs(i)).cast("string"), lit("None"))
      else litPart
    }
    if (pieces.isEmpty) lit("") else concat(pieces: _*)
  }
}
