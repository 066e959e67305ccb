package graft
import org.apache.spark.sql.{SparkSession, DataFrame, functions => F}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The actual inventory lives in [[graft.queries.Catalog]]; one entry per
  * implemented operator from SURVEY.md §2, each with a DuckDB oracle. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped pricing summary over lineitem (Catalog q01). */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Catalog.queries

  def oracleSql: Map[String, String] =
    graft.queries.Catalog.oracleSql
}
