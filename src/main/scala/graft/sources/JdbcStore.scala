package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** JDBC-backed store for the engine's CONTROL tables — the reference
  * writes its checks to MySQL (database/orm/tables/checks_urlset.py:
  * 20-47) and its queues live beside them; the parquet [[Warehouse]]
  * reproduces those semantics for the lakehouse deployment, and this
  * adapter reproduces them for a user who actually has the RDBMS.
  * Built on Spark's JDBC datasource, so Catalyst still plans the reads
  * (filters push into the database as WHERE clauses).
  *
  * SCALE CONTRACT — JDBC is for control-plane tables (checks, alert
  * logs, retry queues: thousands-to-millions of rows), never for fact
  * data. Two sharp edges the API surfaces instead of hiding:
  *
  *  - an unpartitioned JDBC read is ONE task holding ONE connection;
  *    [[read]] takes an optional numeric partition spec
  *    (column/lower/upper/n) that Spark turns into n range-predicate
  *    queries — required reading for any table past control size;
  *  - writes stream through `batchsize`-row inserts per partition;
  *    [[append]] coalesces to `maxWriteConnections` so a wide cluster
  *    cannot open hundreds of simultaneous connections against one
  *    database (the reference's MySQL would fall over).
  *
  * Exactly-once: [[idempotentAppend]] anti-joins the incoming batch
  * against the sink slice matching its replay keys — the slice read
  * pushes an IN predicate down to the database, so the cost is
  * proportional to the batch's keys, not the table. Same contract as
  * [[Warehouse.idempotentAppend]] (replay identity, not row identity).
  *
  * `columnTypes` maps column names to SQL types for table creation
  * (Spark's default String mapping is CLOB on some dialects — Derby
  * included — which cannot anchor WHERE-clause equality; pass
  * VARCHAR(n) for key columns). */
final class JdbcStore(spark: SparkSession, url: String,
                      properties: Map[String, String] = Map.empty,
                      maxWriteConnections: Int = 8) {

  final case class PartitionSpec(column: String, lower: Long, upper: Long,
                                 n: Int)

  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    properties.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  def append(table: String, df: DataFrame,
             columnTypes: Map[String, String] = Map.empty): Unit = {
    val writer = df.coalesce(maxWriteConnections).write.mode(SaveMode.Append)
    val typed =
      if (columnTypes.isEmpty) writer
      else writer.option("createTableColumnTypes",
        columnTypes.map { case (c, t) => s"$c $t" }.mkString(", "))
    typed.jdbc(url, table, props)
  }

  def read(table: String, partitions: Option[PartitionSpec] = None): DataFrame =
    partitions match {
      case Some(ps) =>
        spark.read
          .option("partitionColumn", ps.column)
          .option("lowerBound", ps.lower)
          .option("upperBound", ps.upper)
          .option("numPartitions", ps.n)
          .jdbc(url, table, props)
      case None => spark.read.jdbc(url, table, props)
    }

  /** True iff `table` exists — asked of the database's own catalog
    * (DatabaseMetaData.getTables), NOT by probing a read and swallowing
    * whatever it throws. The distinction is load-bearing for
    * [[idempotentAppend]]: a transient connection error mistaken for
    * "table absent" would skip the replay anti-join and double-write
    * the batch, so anything other than a clean catalog answer
    * PROPAGATES (fail closed). Identifier case is dialect-soup
    * (Derby/Postgres fold differently), so the bare/UPPER/lower
    * spellings are each tried. */
  def exists(table: String): Boolean = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val md = conn.getMetaData
      val (schema, bare) = table.lastIndexOf('.') match {
        case -1 => (null, table)
        case i  => (table.substring(0, i), table.substring(i + 1))
      }
      val schemas =
        if (schema == null) Seq(null)
        else Seq(schema, schema.toUpperCase, schema.toLowerCase).distinct
      schemas.exists(sv =>
        Seq(bare, bare.toUpperCase, bare.toLowerCase).distinct.exists { t =>
          val rs = md.getTables(null, sv, t, null)
          try rs.next() finally rs.close()
        })
    } finally conn.close()
  }

  /** Exactly-once append keyed on `keys`: drop rows whose key tuple
    * already exists in the sink. The sink read is PRUNED to the batch's
    * key values first — an IN predicate Spark pushes into the database —
    * so replaying a batch costs one indexed lookup per key, not a table
    * scan. `keys.head` drives the pushdown (compound keys resolve the
    * remainder in the Spark-side anti-join). Returns rows written. */
  def idempotentAppend(table: String, df: DataFrame, keys: Seq[String],
                       columnTypes: Map[String, String] = Map.empty): Long = {
    val fresh =
      if (!exists(table)) df
      else {
        val keyVals = df.select(keys.head).distinct().collect()
          .map(_.get(0)).toSeq
        val sink = read(table)
          .filter(col(keys.head).isInCollection(keyVals))
          .select(keys.map(col): _*)
        Relational.idempotentFilter(df, sink, keys)
      }
    val n = fresh.count()
    if (n > 0) append(table, fresh, columnTypes)
    n
  }
}
