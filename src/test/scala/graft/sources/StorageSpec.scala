package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class StorageSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(): String =
    Files.createTempDirectory("graft_store").toString

  test("staging: unprocessed-only incremental read with watermark") {
    val root = tmpRoot()
    val st = new StagingStore(spark, root)
    st.appendAt("docs", Seq((1, "a"), (2, "b")).toDF("id", "v"),
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))
    // first read sees everything
    val batch1 = st.readUnprocessed("docs", "op1")
    assert(batch1.count() === 2)
    st.advanceWatermark("docs", "op1", batch1)
    // nothing new → empty
    assert(st.readUnprocessed("docs", "op1").count() === 0)
    // late batch arrives → only it is read
    st.appendAt("docs", Seq((3, "c")).toDF("id", "v"),
      java.sql.Timestamp.valueOf("2024-01-02 10:00:00"))
    val batch2 = st.readUnprocessed("docs", "op1")
    assert(batch2.select("id").as[Int].collect().toSeq === Seq(3))
    // a second operation has its own watermark and still sees everything
    assert(st.readUnprocessed("docs", "op2").count() === 3)
  }

  test("warehouse: idempotent append is exactly-once under replay") {
    val root = tmpRoot()
    val wh = new Warehouse(spark, root)
    val batch = Seq(("2024-01-01", "p1", 10), ("2024-01-01", "p2", 20))
      .toDF("date", "prop", "v")
    assert(wh.idempotentAppend("facts", batch, Seq("prop", "date")) === 2)
    // exact replay: no new rows
    assert(wh.idempotentAppend("facts", batch, Seq("prop", "date")) === 0)
    assert(wh.read("facts").count() === 2)
    // partial overlap: only the new key lands
    val next = Seq(("2024-01-01", "p2", 99), ("2024-01-02", "p1", 30))
      .toDF("date", "prop", "v")
    assert(wh.idempotentAppend("facts", next, Seq("prop", "date")) === 1)
    assert(wh.read("facts").count() === 3)
    // original p2 value retained (first write wins)
    assert(wh.read("facts").filter(col("prop") === "p2").select("v")
      .as[Int].head() === 20)
  }

  test("warehouse: merge replaces matched keys, appends new, keeps other partitions") {
    val root = tmpRoot()
    val wh = new Warehouse(spark, root)
    wh.append("metrics", Seq(
      ("2024-01-01", 1L, 10.0), ("2024-01-01", 2L, 20.0),
      ("2024-01-02", 3L, 30.0)).toDF("date", "id", "v"))
    // update id=1, insert id=4, both in the 01-01 partition; 01-02 untouched
    wh.merge("metrics", Seq(
      ("2024-01-01", 1L, 11.0), ("2024-01-01", 4L, 40.0)).toDF("date", "id", "v"),
      keys = Seq("id"))
    val out = wh.read("metrics").as[(Long, Double, String)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out === Map(
      1L -> (11.0, "2024-01-01"), 2L -> (20.0, "2024-01-01"),
      4L -> (40.0, "2024-01-01"), 3L -> (30.0, "2024-01-02")))
    // merge into a missing table degrades to plain append
    wh.merge("fresh", Seq(("2024-01-01", 9L, 9.0)).toDF("date", "id", "v"),
      keys = Seq("id"))
    assert(wh.read("fresh").count() === 1)
    // replaying the same merge is a no-op on values (idempotent upsert)
    wh.merge("metrics", Seq(
      ("2024-01-01", 1L, 11.0), ("2024-01-01", 4L, 40.0)).toDF("date", "id", "v"),
      keys = Seq("id"))
    assert(wh.read("metrics").count() === 4)
  }

  test("property: idempotent append — replaying any batch sequence equals once") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // keys are REPLAY identity, not row identity: a batch may carry many
    // rows per key (a GSC day), so the model keeps every occurrence from
    // the FIRST batch that introduced a key and drops later batches' rows
    val genBatch = Gen.listOf(Gen.choose(1, 40))
    val batches = Gen.listOfN(6, genBatch)
      .apply(Gen.Parameters.default, Seed(7L)).get
    val root = tmpRoot()
    val wh = new Warehouse(spark, root)
    batches.foreach { ids =>
      val df = ids.map(i => ("2024-01-01", i.toLong)).toDF("date", "id")
      if (ids.nonEmpty) {
        wh.idempotentAppend("props", df, Seq("id"))
        wh.idempotentAppend("props", df, Seq("id")) // immediate replay
      }
    }
    val stored = wh.read("props").select("id").as[Long].collect().sorted.toSeq
    val expected = batches.foldLeft((Set.empty[Int], List.empty[Int])) {
      case ((seen, acc), ids) =>
        val fresh = ids.filterNot(seen)
        (seen ++ fresh, acc ++ fresh)
    }._2.map(_.toLong).sorted
    assert(stored === expected,
      "replaying any batch sequence adds each key's rows exactly once")
  }

  test("warehouse: truncate replaces") {
    val root = tmpRoot()
    val wh = new Warehouse(spark, root)
    wh.append("t", Seq(("2024-01-01", 1)).toDF("date", "v"))
    wh.truncate("t", Seq(("2024-01-02", 2)).toDF("date", "v"))
    assert(wh.read("t").select("v").as[Int].collect().toSeq === Seq(2))
  }

  test("bucketed tables join without a shuffle on either side") {
    val root = tmpRoot()
    val wh = new Warehouse(spark, root)
    val facts = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
    val dims = (1 to 1000).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    wh.appendBucketed("facts_b", facts, Seq("k"), 4)
    wh.appendBucketed("dims_b", dims, Seq("k"), 4)
    val joined = wh.readBucketed("facts_b").join(wh.readBucketed("dims_b"), "k")
    // force SMJ so the bucket layout (not a broadcast) carries the join
    val plan = spark.sessionState.executePlan(
      joined.hint("merge").queryExecution.logical).executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(joined.count() === 1000)
  }

  test("bucketed tables reopen after the catalog registration is lost") {
    // a persisted signature store must survive the JVM that wrote it;
    // simulate the fresh-driver case by dropping the session-catalog
    // entry (the on-disk data + bucket spec are all a new session has)
    val root = tmpRoot()
    val wh = new Warehouse(spark, root)
    wh.appendBucketed("reopen_b", (1 to 50).map(i => (i.toLong, i * 3.0))
      .toDF("k", "v"), Seq("k"), 4)
    val name = spark.catalog.listTables()
      .filter(col("name").contains("reopen_b")).head().name
    spark.sql(s"DROP TABLE $name") // external: data stays on disk
    assert(!spark.catalog.tableExists(name))
    val reopened = wh.readBucketed("reopen_b")
    assert(reopened.count() === 50)
    // the re-registered table still carries the bucket layout: joining
    // two reopened tables stays exchange-free
    wh.appendBucketed("reopen_c", (1 to 50).map(i => (i.toLong, s"d$i"))
      .toDF("k", "name"), Seq("k"), 4)
    val plan = spark.sessionState.executePlan(
      reopened.join(wh.readBucketed("reopen_c"), "k").hint("merge")
        .queryExecution.logical).executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"reopened bucketed join must not shuffle:\n$plan")
    // appends keep working against the re-registered table
    wh.appendBucketed("reopen_b", Seq((51L, 153.0)).toDF("k", "v"),
      Seq("k"), 4)
    assert(wh.readBucketed("reopen_b").count() === 51)
  }

  test("bucketed append rejects a drifted bucket layout instead of corrupting the spec") {
    val root = tmpRoot()
    val wh = new Warehouse(spark, root)
    wh.appendBucketed("drift_t", Seq((1L, "a")).toDF("k", "v"), Seq("k"), 4)
    val e = intercept[IllegalArgumentException] {
      wh.appendBucketed("drift_t", Seq((2L, "b")).toDF("k", "v"), Seq("k"), 8)
    }
    assert(e.getMessage.contains("bucket layout mismatch"))
    // the original spec survives and the store still opens
    assert(wh.readBucketed("drift_t").count() === 1)
  }

  test("bucketed read reports a spec-only shell (interrupted first write)") {
    // the spec is written BEFORE the data, so a crash mid-first-write
    // leaves spec-without-data; reopening must say so, not fail schema
    // inference on an empty directory
    val root = tmpRoot()
    val wh = new Warehouse(spark, root)
    val dir = new java.io.File(s"$root/warehouse/shell_t")
    dir.mkdirs()
    Files.writeString(
      new java.io.File(dir, "_graft_bucket_spec").toPath, "4\nk\n")
    val e = intercept[IllegalArgumentException] {
      wh.readBucketed("shell_t")
    }
    assert(e.getMessage.contains("no data files"))
  }

  test("queue: enqueue / drain deletes on read / re-enqueue") {
    val root = tmpRoot()
    val q = new QueueStore(spark, root)
    val schema = Seq((1, "x")).toDF("id", "spec").schema
    q.enqueue("retry", Seq((1, "x"), (2, "y")).toDF("id", "spec"))
    val drained = q.drain("retry", schema)
    assert(drained.size === 2)
    assert(q.peek("retry", schema).count() === 0, "delete-on-read")
    // dispatch failure → re-enqueue survives for the next run
    q.enqueue("retry", spark.createDataFrame(
      spark.sparkContext.parallelize(drained.take(1)), schema))
    assert(q.peek("retry", schema).count() === 1)
  }
}
