package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators._

/** Crash-atomicity of the incremental-store family: a kill injected
  * mid-ingest (between table writes, or after every write but before
  * the commit publishes) must leave a store from which a BLIND retry —
  * same call, no external snapshot, no manual cleanup — converges to
  * exactly the state an uncrashed run produces. */
class StoreTxnSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def corpus(n: Int, seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
    var prev = ""
    (0L until n).map { i =>
      val text =
        if (i % 3 == 2 && prev.nonEmpty) {
          val toks = prev.split(" ").toVector
          toks.updated(rnd.nextInt(toks.size),
            vocab(rnd.nextInt(vocab.size))).mkString(" ")
        } else Vector.fill(12 + rnd.nextInt(6))(
          vocab(rnd.nextInt(vocab.size))).mkString(" ")
      prev = text
      (i, text)
    }
  }

  private def pairKey(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").as[(Long, Long)].collect().toSet

  override def afterAll(): Unit = {
    StoreTxn.hooks.reset()
    StoreTxn.leaseTtlMs = 60000L
    super.afterAll()
  }

  /** Emulate a process death and wait out the corpse's lease. */
  private def crashAndExpire(body: => Unit): Unit = {
    StoreTxn.leaseTtlMs = 250L
    try {
      intercept[StoreTxn.SimulatedCrash](body)
      Thread.sleep(400) // the dead writer's lease heartbeat goes stale
    } finally StoreTxn.hooks.reset()
  }

  test("minhash store: kill between the sig and set table writes, blind retry converges") {
    val cfg = MinhashConfig(shingleN = 3, bands = 8, rowsPerBand = 2,
      threshold = 0.5, seed = 7L)
    val docs = corpus(60, seed = 1L).toDF("id", "text")
    val full = pairKey(Dedup.minhashPortablePairs(docs, "id", "text",
      cfg.shingleN, cfg.bands, cfg.rowsPerBand, cfg.threshold, cfg.seed,
      cfg.maxBucket))
    assert(full.nonEmpty)
    val root = tmp("graft_txn_mh_")
    val b1 = docs.filter(col("id") < 40)
    val b2 = docs.filter(col("id") >= 40)

    val p1 = pairKey(new MinhashStore(new Warehouse(spark, root), "t", cfg)
      .ingest(b1, "id", "text"))
    // ingest 2 dies at its SECOND directory registration — the sig
    // table already carries batch-2 signatures, the set table doesn't
    StoreTxn.hooks.crashAfterTouches = 2
    crashAndExpire {
      new MinhashStore(new Warehouse(spark, root), "t", cfg)
        .ingest(b2, "id", "text")
      ()
    }
    assert(new java.io.File(root, "_txn/intent").exists(),
      "the kill must leave a dangling intent")
    // blind retry: a fresh handle, the same call — recovery rolls the
    // partial ingest back, then the retry re-ingests
    val p2 = pairKey(new MinhashStore(new Warehouse(spark, root), "t", cfg)
      .ingest(b2, "id", "text"))
    assert(p1 === full.filter(p => p._1 < 40 && p._2 < 40))
    assert(p2 === full.filter(p => p._1 >= 40 || p._2 >= 40),
      "post-crash retry must emit exactly the full-run pairs touching batch 2")
    assert(!new java.io.File(root, "_txn/intent").exists())
    // and the store is NOT double-populated: a third, disjoint ingest
    // sees each batch-2 signature exactly once (a duplicate would
    // surface as a duplicate pair emission here)
    val wh = new Warehouse(spark, root)
    val sigRows = wh.readBucketed("t_mh_sig").groupBy("id", "band")
      .count().filter(col("count") > 1).count()
    assert(sigRows === 0L, "no duplicated signatures after crash+retry")
  }

  test("bm25 index: kill after all writes but before commit, blind retry serves the one-shot ranking") {
    val docs = (1L to 40L).map(i =>
      (i, if (i % 4 == 0) s"spark engine cluster run$i" else s"filler$i words here"))
    val root = tmp("graft_txn_bm_")
    val idx = new Retrieval.Bm25Index(spark, root, "t", nStoreBuckets = 2)
    idx.append(docs.filter(_._1 <= 20).toDF("doc_id", "text"), "doc_id", "text")
    StoreTxn.hooks.crashBeforeCommit = true
    crashAndExpire {
      idx.append(docs.filter(_._1 > 20).toDF("doc_id", "text"), "doc_id", "text")
    }
    // a completed-but-unpublished append rolls back entirely; the blind
    // retry (fresh handle — the old JVM died) re-appends
    val idx2 = new Retrieval.Bm25Index(spark, root, "t", nStoreBuckets = 2)
    idx2.append(docs.filter(_._1 > 20).toDF("doc_id", "text"), "doc_id", "text")
    val served = idx2.search(Seq("spark"), k = 5)
      .select("id", "score").as[(Long, Double)].collect().toSeq
    val oneShot = Retrieval.bm25TopK(docs.toDF("doc_id", "text"),
        "doc_id", "text", Seq("spark"), 5)
      .select("id", "score").as[(Long, Double)].collect().toSeq
    assert(served === oneShot && served.nonEmpty,
      "crash+retry must be bit-identical to the uncrashed one-shot build")
  }

  test("bm25 index: a crashed keyed append re-appends on redelivery (no stale skip)") {
    val docs = (1L to 10L).map(i => (i, s"alpha beta doc$i")).toDF("doc_id", "text")
    val root = tmp("graft_txn_bmkey_")
    val idx = new Retrieval.Bm25Index(spark, root, "t", nStoreBuckets = 2)
    StoreTxn.hooks.crashBeforeCommit = true
    crashAndExpire { idx.appendOnce(docs, "doc_id", "text", Some("ck#0")) }
    // redelivery of the SAME key after the crash: the stats marker never
    // committed, so this must re-append, not skip
    val idx2 = new Retrieval.Bm25Index(spark, root, "t", nStoreBuckets = 2)
    idx2.appendOnce(docs, "doc_id", "text", Some("ck#0"))
    assert(idx2.search(Seq("alpha"), k = 20).count() === 10L)
    // and a second redelivery after the COMMITTED append is a no-op
    idx2.appendOnce(docs, "doc_id", "text", Some("ck#0"))
    assert(idx2.search(Seq("alpha"), k = 20).count() === 10L)
  }

  test("curation store: kill mid-ingest, blind retry equals the uncrashed run") {
    val cfg = Pipeline.CurateConfig(minQuality = 0.0, maxRepetition = 1.0,
      minhash = MinhashConfig(shingleN = 3, bands = 8, rowsPerBand = 2,
        threshold = 0.5, seed = 7L))
    val docs = corpus(60, seed = 4L).toDF("id", "text")
    val b1 = docs.filter(col("id") < 40)
    val b2 = docs.filter(col("id") >= 40)

    def corpusIds(root: String, deltas: Seq[Pipeline.CurateDelta]): Seq[Long] = {
      val kept = deltas.map(_.kept.select("id")).reduce(_ unionByName _)
      val retracted = deltas.map(_.retracted).reduce(_ unionByName _)
      kept.join(retracted, Seq("id"), "left_anti").as[Long].collect().sorted.toSeq
    }

    // reference: the same two ingests, no crash
    val cleanRoot = tmp("graft_txn_cur_clean_")
    val cleanStore = new Pipeline.CurationStore(spark, cleanRoot, "t", cfg)
    val cleanDeltas = Seq(cleanStore.ingest(b1, "id", "text"),
      cleanStore.ingest(b2, "id", "text"))
    val expected = corpusIds(cleanRoot, cleanDeltas)

    // crashed run: ingest 2 dies between its state writes
    val root = tmp("graft_txn_cur_")
    val store = new Pipeline.CurationStore(spark, root, "t", cfg)
    val d1 = store.ingest(b1, "id", "text")
    StoreTxn.hooks.crashAfterTouches = 3
    crashAndExpire { store.ingest(b2, "id", "text"); () }
    assert(store.maxIngestedId === Some(39L),
      "the marker must still read the last COMMITTED ingest")
    // blind retry on a fresh handle (the old process died)
    val retryStore = new Pipeline.CurationStore(spark, root, "t", cfg)
    val d2 = retryStore.ingest(b2, "id", "text")
    assert(retryStore.maxIngestedId === Some(59L))
    assert(corpusIds(root, Seq(d1, d2)) === expected,
      "crash + blind retry must converge to the uncrashed corpus")
  }

  test("an ingest failing with an ordinary exception rolls back immediately") {
    val cfg = Pipeline.CurateConfig(minQuality = 0.0, maxRepetition = 1.0,
      minhash = MinhashConfig(shingleN = 3, bands = 8, rowsPerBand = 2,
        threshold = 0.5, seed = 7L))
    val docs = corpus(30, seed = 5L).toDF("id", "text")
    val root = tmp("graft_txn_rb_")
    val store = new Pipeline.CurationStore(spark, root, "t", cfg)
    val boom = intercept[RuntimeException] {
      store.ingest(docs, "id", "text",
        beforeCommit = _ => throw new RuntimeException("sink down"))
    }
    assert(boom.getMessage === "sink down")
    // rollback already ran — no intent, no marker, and an immediate
    // retry (no lease wait: the failed txn released its lease) succeeds
    assert(!new java.io.File(root, "_txn/intent").exists())
    assert(store.maxIngestedId === None)
    val d = store.ingest(docs, "id", "text")
    assert(d.kept.count() > 0)
  }

  test("a live foreign writer blocks a second writer with a clear error") {
    val root = tmp("graft_txn_lease_")
    val leaseFile = new java.io.File(root, "_txn/lease")
    leaseFile.getParentFile.mkdirs()
    java.nio.file.Files.writeString(leaseFile.toPath, "jvm=elsewhere pid=1\n")
    val idx = new Retrieval.Bm25Index(spark, root, "t", nStoreBuckets = 2)
    val e = intercept[IllegalStateException] {
      idx.append(Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text")
    }
    assert(e.getMessage.contains("locked by another maintenance writer"))
    // a STALE lease (dead owner) is stolen silently
    assert(leaseFile.setLastModified(System.currentTimeMillis - 120000L))
    idx.append(Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text")
    assert(idx.search(Seq("a"), 1).count() === 1L)
  }

  test("a crash BETWEEN commit publish and intent cleanup rolls forward") {
    val docs = (1L to 10L).map(i => (i, s"alpha beta doc$i")).toDF("doc_id", "text")
    val root = tmp("graft_txn_fwd_")
    val idx = new Retrieval.Bm25Index(spark, root, "t", nStoreBuckets = 2)
    idx.append(docs, "doc_id", "text")
    // simulate the crash window: the commit record (epoch 1) published,
    // but the epoch-1 intent was never cleaned up — it snapshots the
    // postings table as EMPTY, so a (wrong) undo would delete all of it
    val intent = new java.io.File(root, "_txn/intent")
    java.nio.file.Files.writeString(intent.toPath,
      "epoch\t1\ndir\twarehouse/t_bm_post\t0\t\n")
    val idx2 = new Retrieval.Bm25Index(spark, root, "t", nStoreBuckets = 2)
    assert(idx2.search(Seq("alpha"), k = 20).count() === 10L,
      "recovery must roll a committed epoch FORWARD, not undo its data")
    assert(!intent.exists(), "the dangling intent is cleared")
  }

  test("nested store ingests commit as ONE epoch (curation + embedded minhash)") {
    val cfg = Pipeline.CurateConfig(minQuality = 0.0, maxRepetition = 1.0,
      minhash = MinhashConfig(shingleN = 3, bands = 4, rowsPerBand = 2,
        threshold = 0.5, seed = 7L))
    val docs = corpus(30, seed = 6L).toDF("id", "text")
    val root = tmp("graft_txn_nest_")
    val store = new Pipeline.CurationStore(spark, root, "t", cfg)
    store.ingest(docs.filter(col("id") < 15), "id", "text")
    store.ingest(docs.filter(col("id") >= 15), "id", "text")
    val commit = java.nio.file.Files.readString(
      new java.io.File(root, "_txn/commit").toPath)
    assert(commit.contains("epoch\t2"),
      s"two ingests = two epochs (embedded minhash joins, not commits): $commit")
  }
}
