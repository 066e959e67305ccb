package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All engine operators are written against plain DataFrames, so in
  * production these would be warehouse paths; the `sfDir` indirection is
  * only the test harness's way of picking a scale factor.
  *
  * Scale notes: each loader is a plain parquet scan, so Catalyst handles
  * column pruning + predicate pushdown; at 100 TB these would be
  * partitioned tables where the `date`-derived filters prune partitions.
  */
object Tables {
  // DataFrames are immutable plan objects, so one per (session, path) can
  // be shared by every query: without this each of the ~120 bench
  // evaluations re-lists the file and re-reads parquet footers for schema.
  // Documented trade: the cached plan pins its file listing, so a path
  // REWRITTEN mid-session would serve stale/missing files — fine here
  // because the driver's testdata is immutable for a session's lifetime;
  // a live table must not go through this cache.
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.getOrElseUpdate((spark, s"$sfDir/$name.parquet"), {
      // events.parquet stores ts as TIMESTAMP(NANOS), which Spark 4 rejects
      // unless read as a raw long (driver-generated data; values are exactly
      // µs-precision, verified — the ns→µs conversion in events() is lossless)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
    })

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** Expose events.ts as a proper session-zone TimestampType column
    * regardless of how the generator encoded it: older testdata wrote
    * TIMESTAMP(NANOS) (read as a raw long via nanosAsLong — values are
    * exactly µs-precision, so the ns→µs truncation is lossless), newer
    * testdata writes TIMESTAMP(MICROS) without the UTC flag, which Spark 4
    * surfaces as TIMESTAMP_NTZ; with the session zone pinned to UTC the
    * NTZ→LTZ cast is value-identity. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.LongType
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      // integer division — `/` would go through double and lose precision
      // above 2^53 (epoch-nanos ≈ 1.7e18)
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** Register every table as a temp view so `spark.sql` programs (the S9/S10
    * query-as-source surface, SURVEY §2.1) can reference them by name.
    * `events` goes through the ts conversion so SQL sees a real timestamp. */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
        "region", "documents", "embeddings")
      .foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
    events(spark, sfDir).createOrReplaceTempView("events")
  }
}
