package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Tables => T, Url}
import graft.functions.{CheckDsl, DateFunctions, HtmlFunctions, TextFunctions}
import graft.operators.{Checks, Dedup, Lookup, Relational, Similarity}
import graft.operators.Checks.Spec

/** The driver-facing query inventory: one entry per implemented operator
  * from SURVEY.md §2 plus the LLM-data-pipeline tier, each paired with an
  * ANSI-SQL oracle the driver runs in DuckDB over the same parquet.
  *
  * Oracle-parity rules (learned the hard way, documented for future
  * queries):
  *  - column names must match exactly (the driver sorts columns by name
  *    before hashing) — alias everything on both sides, lowercase;
  *  - never hash a float that came out of an order-dependent aggregation:
  *    sums of 2-decimal money go through decimal(18,2) in BOTH engines
  *    (exact, order-independent), then cast to double;
  *  - scalar float math is fine IF the oracle mirrors the exact IEEE op
  *    order (same parenthesisation), since both engines use binary64;
  *  - timestamps are exported as epoch microseconds (bigint) — parquet
  *    NANOS vs MICROS physical types would otherwise compare unequal;
  *  - regexes must stay in the RE2-compatible subset (no backreferences)
  *    so Spark (Java regex) and DuckDB (RE2) agree;
  *  - DuckDB regexp_replace needs the 'g' flag to match Spark's
  *    replace-all default.
  */
object Catalog {

  final case class QueryDef(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  // ---------------------------------------------------------------- helpers

  /** Money-safe sum: exact decimal accumulation, double result. */
  private[queries] def dsum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Stopword list literal for DuckDB. */
  private[queries] def sqlList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  /** DuckDB mirror of TextFunctions.tokens. */
  private[queries] val duckToks =
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> len(t) > 0)"

  /** DuckDB mirror of TextFunctions.rawTokens — position-aligned with
    * [[duckToks]] but case-preserving (excision rebuilds from this). */
  private[queries] val duckRawToks =
    "list_filter(string_split_regex(text, '\\s+'), t -> len(t) > 0)"

  /** DuckDB mirror of the native PolyHash expression (rolling 31-hash
    * mod 1e9+7) over an arbitrary string-valued SQL expression. ONE
    * definition for every oracle — this fragment is parity-critical and
    * used to be copy-pasted per query. */
  private[queries] def duckPolyHash(expr: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |              list_transform(range(1, length($expr) + 1),
       |                i -> CAST(ascii(substr($expr, CAST(i AS INTEGER), 1)) AS BIGINT))),
       |              (a, x) -> (a * 31 + x) % 1000000007)""".stripMargin

  /** DuckDB mirror of Sampling.hashBucket(id, buckets, salt). */
  private[queries] def duckHashBucket(idExpr: String, buckets: Long,
                                      salt: String): String =
    s"${duckPolyHash(s"$idExpr::VARCHAR || '$salt'")} % $buckets"

  /** DuckDB mirror of VectorFunctions.dot(a, b): left fold in index order
    * with 0.0 init — bit-identical to Spark's `aggregate`. */
  private[queries] def duckDot(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1), " +
      s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), (x, y) -> x + y)"

  /** q42's hyperplane tables — one source of truth for the Spark query
    * AND the generated oracle SQL (integer coefficients, so both engines
    * compute identical sign bits). */
  private[queries] val q42Planes: Seq[Seq[Seq[Double]]] =
    (0 until 4).map(t =>
      graft.functions.VectorFunctions.latticePlanes(8, 64, 42L + t))

  private[queries] def duckL2(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a) + 1), " +
      s"i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE))), (x, y) -> x + y)"

  // ----------------------------------------------------------- definitions

  val defs: Seq[QueryDef] =
    RelationalQueries.defs ++ ChecksQueries.defs ++ LlmQueries.defs ++
      SimilarityQueries.defs ++ MultimodalQueries.defs ++
      CurationQueries.defs ++ SequenceQueries.defs ++ QualityQueries.defs ++
      ScaleQueries.defs

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  val oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(o => d.name -> o.trim)).toMap
}
