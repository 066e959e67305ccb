package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The JDBC control-table adapter against EMBEDDED Derby (in the Spark
  * distribution) — a real database, real SQL dialect, no egress: the
  * same checks-table semantics the reference keeps in MySQL. */
class JdbcStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshDb(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby_")
    s"jdbc:derby:$dir/db;create=true"
  }

  // Derby maps Spark StringType to CLOB, which cannot anchor equality —
  // every string column that participates in a key needs a VARCHAR type
  private val checkTypes = Map("url" -> "VARCHAR(500)",
    "checkname" -> "VARCHAR(100)")

  private def checksBatch(day: Int, n: Int) =
    (1 to n).map(i => (s"https://example.com/p$i", "has_title",
      i % 2 == 0, day.toLong)).toDF("url", "checkname", "valid", "day")

  test("append + read round-trips a checks table through a real database") {
    val store = new JdbcStore(spark, freshDb())
    store.append("checks", checksBatch(1, 20), checkTypes)
    val back = store.read("checks")
    assert(back.count() === 20)
    assert(back.filter(col("valid")).count() === 10)
    // filter pushdown reaches the database scan
    val plan = back.filter(col("day") === 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("day"),
      s"JDBC scan must push the filter:\n$plan")
  }

  test("idempotent append: replaying a batch is a no-op, new batches land") {
    val store = new JdbcStore(spark, freshDb())
    val b1 = checksBatch(1, 15)
    assert(store.idempotentAppend("checks", b1, Seq("day"), checkTypes) === 15L)
    assert(store.idempotentAppend("checks", b1, Seq("day"), checkTypes) === 0L,
      "replay of a committed batch must append nothing")
    assert(store.read("checks").count() === 15)
    assert(store.idempotentAppend("checks", checksBatch(2, 10),
      Seq("day"), checkTypes) === 10L)
    assert(store.read("checks").count() === 25)
  }

  test("partitioned read splits the table across range predicates") {
    val store = new JdbcStore(spark, freshDb())
    store.append("wide",
      (1L to 1000L).map(i => (i, s"row$i")).toDF("id", "payload"),
      Map("payload" -> "VARCHAR(50)"))
    val part = store.read("wide",
      Some(store.PartitionSpec("id", 1L, 1000L, 4)))
    assert(part.rdd.getNumPartitions === 4,
      "partition spec must fan the read out over range queries")
    assert(part.count() === 1000)
  }

  test("writes cap their connection fan-out") {
    val store = new JdbcStore(spark, freshDb(), maxWriteConnections = 2)
    store.append("capped",
      spark.range(100).repartition(16).select(col("id")).toDF("id"))
    assert(store.read("capped").count() === 100)
  }
}
