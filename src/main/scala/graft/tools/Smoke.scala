package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{CheckDsl, TextFunctions}
import graft.operators.{Dedup, Relational, Similarity}

/** Manual end-to-end smoke drive: runs each operator family against the
  * driver-generated parquet at a given scale factor and prints a sample.
  * The rebuild's analogue of the reference's module-debugger.py
  * (/root/reference/module-debugger.py:1-24).
  *
  * Usage: sbt "runMain graft.tools.Smoke /root/testdata/sf0.001"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val events = Tables.events(spark, sfDir)

    def show(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      println(s"=== $name ===")
      try f.show(5, 60)
      catch { case e: Throwable => println(s"FAILED: ${e.getMessage}") }
    }

    show("CheckDsl.compile on events") {
      events.withColumn("ok", CheckDsl.compile("{value} >= 50"))
        .select("event_id", "value", "ok")
    }
    show("CheckDsl null-safe ==") {
      events.withColumn("prev",
          lag(col("value"), 1).over(org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy("ts")))
        .withColumn("prev_is_null", CheckDsl.compile("{prev} == null"))
        .select("event_id", "prev", "prev_is_null")
    }
    show("regexTemplate") {
      docs.withColumn("tag",
        CheckDsl.regexTemplate(col("source"), "^src(\\d+)$", "bucket-$1", Some("none")))
        .select("doc_id", "source", "tag")
    }
    show("TextFunctions word/token/langId/fingerprint") {
      docs.select(col("doc_id"),
        TextFunctions.wordCount(col("text")).as("words"),
        TextFunctions.tokenCount(col("text")).as("toks"),
        TextFunctions.langId(col("text")).as("lang_pred"),
        TextFunctions.fingerprint(col("text")).as("fp"),
        TextFunctions.qualityScore(col("text")).as("q"))
    }
    show("wordShingles incl. empty doc") {
      spark.range(1).select(
        TextFunctions.wordShingles(lit(""), 3).as("empty_shingles"),
        TextFunctions.wordShingles(lit("one two"), 3).as("short"),
        TextFunctions.wordShingles(lit("a b c d"), 3).as("full"))
    }
    show("Dedup.exact on substr(text,1,30)") {
      Dedup.exact(docs.withColumn("k", substring(col("text"), 1, 30)), "doc_id", "k")
        .select("doc_id", "k")
    }
    show("Dedup.ngramJaccardPairs") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.1, 1000)
    }
    show("Dedup.minhashLshPairs") {
      Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 16, 4, 0.2)
    }
    show("Dedup.simhashPairs") {
      Dedup.simhashPairs(docs, "doc_id", "text", 10)
    }
    show("Relational.latestSnapshot(events by user)") {
      Relational.latestSnapshot(events, Seq("user_id"), "ts", Seq("event_id"))
    }
    show("Relational.duplicateValues(part brand)") {
      val part = Tables.part(spark, sfDir)
      Relational.duplicateValues(part.limit(200), "p_partkey", "p_brand")
        .select("p_partkey", "p_brand", "dup_count", "is_duplicate")
    }
    show("Similarity.bruteForceTopK") {
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding", 3)
    }
    show("Similarity.ivfTopK (centroids = first 8 vectors)") {
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cell"),
          col("embedding").cast("array<double>").as("cvec"))
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding",
        3, cents, 2)
    }
    show("Similarity.lshNearDupPairs") {
      Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.35, dim = 64, tables = 4, bitsPerTable = 4)
    }
    show("Sequences.chunkDocuments(64/16)") {
      graft.operators.Sequences.chunkDocuments(docs, "doc_id", "text", 64, 16)
    }
    show("Sequences.packSequences(256)") {
      graft.operators.Sequences.packSequences(
        docs.select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", 256L, "smoke")
    }
    show("Sequences.dropRepeatedBlocks(16, df>=2)") {
      graft.operators.Sequences.dropRepeatedBlocks(docs, "doc_id", "text", 16, 2)
    }
    show("Dedup.duplicateSpans(k=5,min=15) + exciseSpans") {
      val spans = Dedup.duplicateSpans(docs, "doc_id", "text", 5, 15)
      Dedup.exciseSpans(docs, "doc_id", "text", spans)
        .filter(col("n_removed") > 0)
    }
    show("Decontamination.contaminationSpans(vs docs<25)") {
      graft.operators.Decontamination.contaminationSpans(
        docs.filter(col("doc_id") >= 25), "doc_id", "text",
        docs.filter(col("doc_id") < 25), "text", 5, 5)
    }
    show("CorpusStats.vocabulary(50) + oovRate") {
      graft.operators.CorpusStats.oovRate(docs, "doc_id", "text",
        graft.operators.CorpusStats.vocabulary(docs, "text", 50))
    }
    show("Bpe.learnMerges(8) + encode") {
      graft.operators.Bpe.encode(docs, "doc_id", "text",
        graft.operators.Bpe.learnMerges(docs, "text", 8))
    }
    show("TextFunctions.normalizeText on mixed forms") {
      spark.range(1).select(
        TextFunctions.normalizeText(lit("CafÉ naïve Straße ＡＢ")).as("norm"),
        TextFunctions.normalizeText(lit("CafÉ"), stripAccents = true,
          lower = false).as("keepcase"))
    }
    show("Decontamination.overlapStats(5-grams vs docs<25)") {
      graft.operators.Decontamination.overlapStats(
        docs.filter(col("doc_id") >= 25), "doc_id", "text",
        docs.filter(col("doc_id") < 25), "text", 5)
    }
    show("CorpusStats.rareTokenRatio(df<3)") {
      graft.operators.CorpusStats.rareTokenRatio(docs, "doc_id", "text", 3L)
    }
    show("Clustering.kmeans(8) + clusterSample + SemDedup") {
      val assigned = graft.operators.Clustering.kmeansAssign(
        emb, "vec_id", "embedding", k = 8, iters = 2)
      val sample = graft.operators.Clustering.clusterSample(
        emb, "vec_id", "embedding", k = 8, iters = 2, perCluster = 2)
      val kept = graft.operators.Clustering.semanticDedupByCluster(
        emb, "vec_id", "embedding", k = 8, iters = 2, threshold = 0.35)
      assigned.groupBy("cell").count()
        .join(sample.groupBy("cell").count()
          .withColumnRenamed("count", "sampled"), Seq("cell"))
        .withColumn("kept_total", lit(kept.count()))
    }
    show("CorpusStats.sourceStats + sourceFilter") {
      graft.operators.CorpusStats.sourceStats(
        docs.withColumn("__k", substring(col("text"), 1, 40)),
        "doc_id", "text", "source", keyCol = Some("__k"))
    }
    show("CorpusStats.corpusReport") {
      graft.operators.CorpusStats.corpusReport(docs, "doc_id", "text")
    }
    show("Retrieval.bm25TopK + rrfFuse vs cosine") {
      val lex = graft.operators.Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq("table", "spark"), 5)
      val sem = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") === 0), "vec_id", "embedding", 5)
        .select(col("nbr_id").as("id"), col("rank"))
      graft.operators.Retrieval.rrfFuse(lex.select("id", "rank"), sem, 5)
    }
    show("RangeJoin.pointInInterval + asofJoin on events") {
      val clicks = events.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"), col("value").as("pv"))
      Relational.asofJoin(clicks, purchases, Seq("user_id"), "ts", "pts")
    }
    show("Sharding.shuffleShards + manifest") {
      val sh = graft.operators.Sharding.shuffleShards(
        docs.select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n")),
        "doc_id", 4, "smoke")
      graft.operators.Sharding.shardManifest(sh, "n")
    }
    show("Sketches: heavyHitters / approxDistinct / quantiles") {
      val toks = docs.select(explode(TextFunctions.tokens(col("text")))
        .as("tok"))
      graft.operators.Sketches.heavyHitters(toks, "tok", 5L, eps = 1e-3)
        .limit(5)
    }
    show("Sequences.dedupBlocksKeepFirst") {
      graft.operators.Sequences.dedupBlocksKeepFirst(docs, "doc_id",
        "text", blockSize = 16)
    }
    show("Sampling.topFractionByScore") {
      graft.operators.Sampling.topFractionByScore(
        docs.select(col("doc_id"), col("lang"),
          TextFunctions.qualityScore(col("text")).as("q")),
        "lang", "q", 0.5)
    }
    show("Quantization.int8TopK (exact-rescore serve)") {
      graft.operators.Quantization.int8TopK(emb,
        emb.filter(col("vec_id") < 3), "vec_id", "embedding", 3)
    }
    show("Quantization.pqEncode + pqTopKEncoded (ADC serve)") {
      val books = graft.operators.Quantization.pqTrain(
        emb, "vec_id", "embedding", dim = 64, m = 4, ksub = 8, iters = 1)
      val codes = graft.operators.Quantization.pqEncode(
        emb, "vec_id", "embedding", books)
      graft.operators.Quantization.pqTopKEncoded(codes, emb,
        emb.filter(col("vec_id") < 3), "vec_id", "embedding", 3, books)
    }
    show("Quantization.ivfPqTopKEncoded (IVF-PQ serve)") {
      val cents = graft.operators.Clustering.kmeans(
        emb, "vec_id", "embedding", k = 8, iters = 1)
      val books = graft.operators.Quantization.pqTrain(
        emb, "vec_id", "embedding", dim = 64, m = 4, ksub = 8, iters = 1)
      val codes = graft.operators.Quantization.pqEncodeAssigned(
        emb, "vec_id", "embedding", cents, books)
      graft.operators.Quantization.ivfPqTopKEncoded(codes, emb,
        emb.filter(col("vec_id") < 3), "vec_id", "embedding", 3,
        cents, books, nProbes = 2)
    }
    show("Multimodal.dHash + signatureNearDupPairs (image dedup)") {
      val grp = docs.limit(40)
        .select(pmod(col("doc_id"), lit(8)).as("g")).distinct()
        .select(col("g"), (col("g") + 16).as("w"), (col("g") + 12).as("h"))
      val media = docs.limit(40)
        .select(col("doc_id"), pmod(col("doc_id"), lit(8)).as("g"))
        .join(graft.operators.Multimodal.synthImages(grp, "g", "w", "h")
          .withColumnRenamed("media_id", "g"), Seq("g"))
        .select(col("doc_id").as("media_id"), col("content"))
      graft.operators.Dedup.signatureNearDupPairs(
        graft.operators.Multimodal.dHash(media, "media_id", "content"),
        "media_id", "dhash", maxDist = 3)
    }
    show("AudioCodec: real WAV meta + energy-envelope ANN") {
      val wavs = graft.operators.Multimodal.synthWavs(
        docs.limit(20).select(col("doc_id"), lit(8000).as("sr"),
          (pmod(col("doc_id"), lit(100)) + 50).as("n")),
        "doc_id", "sr", "n")
      val feats = graft.operators.Multimodal.audioFeatures(
        wavs, "media_id", "content", dim = 8)
      graft.operators.Multimodal.withDecodedMeta(
          wavs.withColumn("kind", lit("audio")),
          "media_id", "content", "kind")
        .join(graft.operators.Similarity.bruteForceTopK(feats,
          feats.limit(2), "media_id", "features", k = 2)
          .withColumnRenamed("nbr_id", "media_id"), Seq("media_id"))
    }
    show("Sampling.repeatSample (epoch oversampling)") {
      graft.operators.Sampling.repeatSample(
        docs.select(col("doc_id"), col("lang")), "lang", "doc_id",
        Seq("en" -> 2.5), defaultFactor = 0.5, salt = "smoke")
    }
    show("Dedup.setJaccardPairs over frame-fingerprint sets") {
      val media = docs.limit(60).select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("content"))
      val frames = graft.operators.Multimodal.sampleFrames(
        media, "media_id", "content", frameSize = 32, everyN = 2)
      graft.operators.Dedup.setJaccardPairs(
        frames.groupBy("media_id")
          .agg(collect_list(Dedup.polyHash(col("frame").cast("string")))
            .as("fset")),
        "media_id", "fset", threshold = 0.5)
    }
    show("HammingStore ingest (precomputed signatures)") {
      val sigs = graft.operators.Quantization.signBits(
        emb.limit(100), "vec_id", "embedding")
      val wh = new graft.sources.Warehouse(spark, java.nio.file.Files
        .createTempDirectory("graft_smoke_hm_").toString)
      new graft.operators.HammingStore(wh, "s",
          graft.operators.HammingConfig(maxDist = 2, nStoreBuckets = 2))
        .ingest(sigs, "id", "sig")
    }
    show("Decontamination.semanticContamination") {
      graft.operators.Decontamination.semanticContamination(
        emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 10)
          .select((col("vec_id") + 5000).as("eval_id"), col("embedding")),
        "eval_id", "embedding", threshold = 0.35)
    }
    show("Quantization.ivfPqTopKEncodedPartitioned (eval-sweep serve)") {
      val cents = graft.operators.Clustering.kmeans(
        emb, "vec_id", "embedding", k = 8, iters = 1)
      val books = graft.operators.Quantization.pqTrain(
        emb, "vec_id", "embedding", dim = 64, m = 4, ksub = 8, iters = 1)
      val codes = graft.operators.Quantization.pqEncodeAssigned(
        emb, "vec_id", "embedding", cents, books)
      graft.operators.Quantization.ivfPqTopKEncodedPartitioned(codes, emb,
        emb.filter(col("vec_id") < 3), "vec_id", "embedding", 3,
        cents, books, nProbes = 2, cellSalt = 4)
    }
    show("WarcSource → curate front door") {
      // byte-synthesized archive: the crawl → text → curation on-ramp
      val html = "<html><body>smoke crawl page</body></html>"
      val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$html"
      val content = http.getBytes("UTF-8")
      val rec = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Target-URI: http://smoke.test/\r\n" +
        "WARC-Date: 2024-01-01T00:00:00Z\r\n" +
        "WARC-Record-ID: <urn:uuid:smoke>\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${content.length}\r\n\r\n").getBytes("UTF-8") ++
        content ++ "\r\n\r\n".getBytes("UTF-8")
      val dir = java.nio.file.Files.createTempDirectory("graft_smoke_warc_")
      java.nio.file.Files.write(dir.resolve("a.warc"), rec)
      graft.sources.WarcSource.readResponses(spark, dir.toString + "/*.warc")
        .select(col("url"),
          graft.functions.TextFunctions.stripHtml(col("text")).as("text"))
    }
    show("Pipeline.curate drop ledger") {
      graft.operators.Pipeline.curate(
        docs.limit(200).select(col("doc_id"), col("text")),
        "doc_id", "text", withAudit = true).audit.get
    }
    show("CurationStore.compact + post-compact ingest") {
      val root = java.nio.file.Files
        .createTempDirectory("graft_smoke_cc_").toString
      val store = new graft.operators.Pipeline.CurationStore(spark, root,
        "s", graft.operators.Pipeline.CurateConfig(minQuality = 0.0,
          maxRepetition = 1.0))
      store.ingest(docs.filter(col("doc_id") < 30)
        .select(col("doc_id"), col("text")), "doc_id", "text")
      store.compact()
      store.ingest(docs.filter(col("doc_id") >= 30 && col("doc_id") < 50)
        .select(col("doc_id"), col("text")), "doc_id", "text").kept
    }
    show("trained quality classifiers (dense + hashed)") {
      import graft.operators.QualityModels
      val labeled = docs.limit(200).select(col("doc_id"), col("text"),
        when(col("doc_id") % 2 === 0, 1L).otherwise(-1L).as("label"))
      val feats = QualityModels.classifierFeatures(labeled, "doc_id", "text")
        .join(labeled.select(col("doc_id").as("id"), col("label")), Seq("id"))
      val wD = QualityModels.trainPerceptron(feats, "label", iters = 2)
      val wH = QualityModels.trainHashedPerceptron(labeled, "doc_id",
        "text", "label", numFeatures = 256, iters = 2)
      QualityModels.hashedMargin(labeled, "doc_id", "text", wH)
        .withColumn("dense_w0", lit(wD(0)))
    }
    show("containment pairs (swallowed-document signal)") {
      graft.operators.Dedup.ngramContainmentPairs(
        docs.select(col("doc_id"), col("text")), "doc_id", "text",
        n = 3, threshold = 0.5, maxDocFreq = 100)
    }
    show("containment store (incremental swallowed-doc detection)") {
      val store = new graft.operators.ContainmentStore(
        new graft.sources.Warehouse(spark,
          java.nio.file.Files.createTempDirectory("smoke_ct_").toString),
        "smoke", graft.operators.ContainmentConfig(
          shingleN = 3, threshold = 0.5, maxDocFreq = 100,
          nStoreBuckets = 4))
      store.ingest(docs.select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 2 === 0), "doc_id", "text")
      store.ingest(docs.select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 2 === 1), "doc_id", "text")
    }
    show("link graph: degrees + fixed-point pageRank + authority gate") {
      // hubbed: 7 sources all pointing into 3 dst nodes — the hubs
      // must out-rank the uniform prior, so the gate keeps rows
      val edges = docs.select(
        pmod(col("doc_id"), lit(7L)).as("src"),
        pmod(col("doc_id") * 31L, lit(3L)).as("dst"),
        lit(1L).as("w")).filter(col("src") =!= col("dst"))
      val ranks = graft.operators.Graph.pageRank(
        edges, "src", "dst", iters = 2, Some("w"))
      val n = ranks.count()
      graft.operators.Graph.authorityGate(
        docs.select(pmod(col("doc_id"), lit(7L)).as("node"), col("doc_id")),
        "node", ranks, minRankFp = (1L << 30) / n)
        .join(graft.operators.Graph.degrees(edges, "src", "dst", Some("w"))
          .withColumnRenamed("node", "node2"),
          col("node") === col("node2"), "left")
        .drop("node2")
    }
    show("edge store: batched appends -> degrees + warm-start pageRank") {
      val edges = docs.select(
        pmod(col("doc_id"), lit(7L)).as("src"),
        pmod(col("doc_id") * 31L, lit(3L)).as("dst"),
        lit(1L).as("w")).filter(col("src") =!= col("dst"))
      val store = new graft.operators.EdgeStore(
        new graft.sources.Warehouse(spark, java.nio.file.Files
          .createTempDirectory("smoke_eg_").toString),
        "smoke", graft.operators.EdgeStoreConfig(
          weightCol = Some("w"), nStoreBuckets = 4))
      store.append(edges.filter(col("dst") % 2 === 0), "src", "dst")
      store.append(edges.filter(col("dst") % 2 === 1), "src", "dst")
      val prior = store.pageRank(spark, iters = 1)
        .select("node", "rank_fp").localCheckpoint(true)
      // the per-epoch maintenance loop: stored page-rank and seeded
      // trust-rank state, warm-started and committed per call
      store.pageRankMaintain(spark, iters = 1)
      val seeds = spark.range(1).select(lit(0L).as("node"))
      store.trustRankMaintain(spark, iters = 1, seeds, "node")
      store.degrees(spark)
        .join(store.pageRank(spark, iters = 1, prior = Some(prior)),
          "node")
        .join(store.pageRankMaintain(spark, iters = 1)
          .select(col("node"), col("rank_fp").as("maint_fp")), "node")
        .join(store.trustRankMaintain(spark, iters = 1, seeds, "node")
          .select(col("node"), col("rank_fp").as("trust_fp")), "node")
    }
    show("trustRank: seed-personalized PageRank (spam-immune trust flow)") {
      val edges = docs.select(
        pmod(col("doc_id"), lit(7L)).as("src"),
        pmod(col("doc_id") * 31L, lit(3L)).as("dst"),
        lit(1L).as("w")).filter(col("src") =!= col("dst"))
      graft.operators.Graph.trustRank(edges, "src", "dst", iters = 2,
        spark.range(1).select(lit(0L).as("node")), "node", Some("w"))
    }
    show("composed crawl chain: WARC -> hostEdges -> EdgeStore -> " +
        "trustRank -> authority-gated curate") {
      // a 3-page mini-crawl: trusted.test links to linked.test;
      // spam.test links only to itself's farm — the gate must keep
      // seed-reachable hosts' docs and shed the farm's
      def page(host: String, n: Int, hrefHost: String, body: String) = {
        val html = s"<html><body><a href=\"http://$hrefHost/x\">l</a>" +
          s"<p>$body</p></body></html>"
        val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$html"
        val content = http.getBytes("UTF-8")
        (s"WARC/1.0\r\nWARC-Type: response\r\n" +
          s"WARC-Target-URI: http://$host/p$n\r\n" +
          "WARC-Date: 2024-01-01T00:00:00Z\r\n" +
          s"WARC-Record-ID: <urn:uuid:smoke-$host-$n>\r\n" +
          "Content-Type: application/http; msgtype=response\r\n" +
          s"Content-Length: ${content.length}\r\n\r\n").getBytes("UTF-8") ++
          content ++ "\r\n\r\n".getBytes("UTF-8")
      }
      val prose = "the quick brown fox jumps over the lazy dog and " +
        "that is a fine day in the sun with you it is true"
      val dir = java.nio.file.Files.createTempDirectory("graft_smoke_cc_")
      java.nio.file.Files.write(dir.resolve("crawl.warc"),
        page("trusted.test", 1, "linked.test", prose) ++
          page("linked.test", 2, "trusted.test", prose + " again now") ++
          page("spam.test", 3, "spam.test", prose + " spam spam"))
      val pages = graft.sources.WarcSource
        .readResponses(spark, dir.toString)
        .select(col("url"), col("text").as("html"))
        .localCheckpoint(true)
      val hostEdges = graft.operators.Graph.hostEdges(pages, "url", "html")
      val store = new graft.operators.EdgeStore(
        new graft.sources.Warehouse(spark, java.nio.file.Files
          .createTempDirectory("smoke_cceg_").toString),
        "crawl", graft.operators.EdgeStoreConfig(weightCol = Some("w"),
          nStoreBuckets = 2))
      // long-keyed store: hash the host strings, keep the dimension
      store.append(hostEdges.select(xxhash64(col("src")).as("src"),
        xxhash64(col("dst")).as("dst"), col("w")), "src", "dst")
      val ranks = graft.operators.Graph.trustRank(
        hostEdges, "src", "dst", iters = 3,
        spark.range(1).select(lit("trusted.test").as("node")), "node",
        Some("w"))
      val docs = pages.select(
        xxhash64(col("url")).as("doc_id"),
        graft.functions.HtmlFunctions.urlHost(col("url")).as("host"),
        graft.functions.TextFunctions.mainContent(col("html")).as("text"))
      val r = graft.operators.Pipeline.curate(docs, "doc_id", "text",
        cfg = graft.operators.Pipeline.CurateConfig(minQuality = 0.0,
          maxRepetition = 1.0),
        withAudit = true,
        authority = Some(graft.operators.Pipeline.AuthorityGate(
          ranks, "host", minRankFp = 0L)))
      val audit = r.audit.get.collect()
      require(audit.exists(_.getString(1) == "authority"),
        "the spam host must drop at the gate")
      r.kept.join(docs.withColumnRenamed("doc_id", "id"), Seq("id"))
        .select("id", "host")
    }
    show("streaming WARC (AvailableNow micro-batches)") {
      val html = "<html><body>stream crawl page</body></html>"
      val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$html"
      val content = http.getBytes("UTF-8")
      val rec = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Target-URI: http://smoke.test/stream\r\n" +
        "WARC-Date: 2024-01-01T00:00:00Z\r\n" +
        "WARC-Record-ID: <urn:uuid:smoke-stream>\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${content.length}\r\n\r\n").getBytes("UTF-8") ++
        content ++ "\r\n\r\n".getBytes("UTF-8")
      val dir = java.nio.file.Files.createTempDirectory("graft_smoke_ws_")
      java.nio.file.Files.write(dir.resolve("a.warc"), rec)
      val q = graft.sources.WarcSource
        .readResponsesStream(spark, dir.toString)
        .writeStream.format("memory").queryName("smoke_warc_stream")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table("smoke_warc_stream")
    }
    spark.stop()
  }
}
