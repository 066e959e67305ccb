package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Tables => T}
import graft.operators.Dedup
import graft.sources.Warehouse
import Catalog.QueryDef

/** Incremental-curation tier: the persisted-signature-store dedup paths
  * and the incremental connected-components fold. Each query exercises an
  * INCREMENTAL ingest (corpus split into two batches by doc-id parity, or
  * a second key family folded into an existing labeling) and is verified
  * against the FULL-CORPUS oracle — the store must make batch-wise
  * ingestion observationally equal to recomputing from scratch.
  * Oracle-parity rules live in [[Catalog]]'s scaladoc. */
private[queries] object CurationQueries {

  /** Fresh scratch root for a per-run signature store. The store is an
    * equivalence HARNESS here (build from batch 1, ingest batch 2); real
    * pipelines point the Warehouse at a persistent root instead. */
  private def scratchRoot(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  val defs: Seq[QueryDef] = Seq(

    // ===== Incremental MinHash: batch-2 ingest against a batch-1 store
    // equals the full-corpus pairs restricted to pairs touching batch 2
    // (even/odd doc-id split; even–even pairs were emitted at ingest 1) =====
    QueryDef("q65_minhash_incremental",
      (s, dir) => {
        val d = T.documents(s, dir)
        val store = new Dedup.MinhashStore(
          new Warehouse(s, scratchRoot("graft_q65_")), "inc",
          Dedup.MinhashConfig(shingleN = 3, bands = 8, rowsPerBand = 2,
            threshold = 0.5, seed = 7L))
        store.ingest(d.filter(col("doc_id") % 2 === 0), "doc_id", "text")
        store.ingest(d.filter(col("doc_id") % 2 === 1), "doc_id", "text")
      },
      Some(LlmQueries.minhashOracle(
        "\n          AND (id_a % 2 = 1 OR id_b % 2 = 1)"))),

    // ===== Incremental SimHash: same contract, signature-only store =====
    QueryDef("q66_simhash_incremental",
      (s, dir) => {
        val d = T.documents(s, dir)
        val store = new Dedup.SimhashStore(
          new Warehouse(s, scratchRoot("graft_q66_")), "inc",
          Dedup.SimhashConfig(maxDist = 3, seed = 7L))
        store.ingest(d.filter(col("doc_id") % 2 === 0), "doc_id", "text")
        store.ingest(d.filter(col("doc_id") % 2 === 1), "doc_id", "text")
          .withColumn("hamming", col("hamming").cast("long"))
      },
      Some(LlmQueries.simhashOracle(
        " AND (id_a % 2 = 1 OR id_b % 2 = 1)"))),

    // ===== Incremental connected components: fold the k2 pair family
    // into the k1-only labeling; must equal q64's full recompute =====
    QueryDef("q67_incremental_components",
      (s, dir) => {
        val d = T.documents(s, dir).select(col("doc_id"),
          length(col("text")).as("__len"),
          substring(col("text"), 1, 40).as("k1"),
          substring(col("text"), 41, 40).as("k2"))
        def pairsBy(k: String, minLen: Int) = {
          val side = d.filter(col("__len") > minLen)
          side.select(col("doc_id").as("id_a"), col(k).as("__k"))
            .join(side.select(col("doc_id").as("id_b"), col(k).as("__k")), "__k")
            .filter(col("id_a") < col("id_b"))
            .select("id_a", "id_b")
        }
        val prev = Dedup.connectedComponents(pairsBy("k1", 0), "id_a", "id_b")
        Dedup.connectedComponentsIncremental(prev, pairsBy("k2", 40),
          "id_a", "id_b")
      },
      Some(LlmQueries.prefixKeyCcOracle)),
  )
}
