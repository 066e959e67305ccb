package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Tables => T}
import graft.functions.TextFunctions
import graft.operators.Sequences
import Catalog.QueryDef
import Catalog.{duckHashBucket, duckToks}

/** Sequence-shaping tier: retrieval chunking and training-sequence
  * packing over the curated corpus — the step between curation and a
  * training/indexing run. Oracle-parity rules live in [[Catalog]]'s
  * scaladoc. */
private[queries] object SequenceQueries {

  val defs: Seq[QueryDef] = Seq(

    // ===== retrieval chunking: fixed-size token windows w/ overlap =====
    QueryDef("q74_chunk_docs",
      (s, dir) => Sequences.chunkDocuments(T.documents(s, dir),
          "doc_id", "text", size = 64, overlap = 16)
        .withColumn("chunk_ix", col("chunk_ix").cast("long"))
        .withColumn("n_tokens", col("n_tokens").cast("long"))
        .withColumnRenamed("id", "doc_id"),
      // step = size - overlap = 48; chunk k covers tokens [48k+1, 48k+64];
      // emitted while it covers ≥1 new token: k ≤ (ntok - 16 - 1) // 48
      Some(s"""
        WITH tk AS (SELECT doc_id, $duckToks AS tk FROM documents),
        nz AS (SELECT * FROM tk WHERE len(tk) > 0),
        ch AS (SELECT doc_id, CAST(k AS BIGINT) AS chunk_ix,
                      tk[k*48 + 1 : k*48 + 64] AS c
               FROM nz, unnest(range(0, greatest(len(tk) - 17, 0) // 48 + 1)) AS t(k))
        SELECT doc_id, chunk_ix, array_to_string(c, ' ') AS chunk_text,
               CAST(len(c) AS BIGINT) AS n_tokens
        FROM ch""")),

    // ===== training-sequence packing: concat-then-chunk in salted-hash
    // order via the two-phase global prefix sum =====
    QueryDef("q75_pack_sequences",
      (s, dir) => Sequences.packSequences(
        T.documents(s, dir).select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", seqLen = 256L, salt = "v1"),
      Some(s"""
        WITH t AS (SELECT doc_id, CAST(len($duckToks) AS BIGINT) AS n_tokens,
            ${duckHashBucket("doc_id", 1000000007L, "v1")} AS h
          FROM documents),
        c AS (SELECT doc_id, n_tokens,
            CAST(sum(n_tokens) OVER (ORDER BY h, doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          FROM t)
        SELECT doc_id, n_tokens,
               (cum - n_tokens) // 256 AS seq_id,
               (cum - n_tokens) % 256 AS seq_offset
        FROM c""")),

    // ===== block-level boilerplate removal: drop 16-token blocks whose
    // exact text recurs in >= 2 docs, reassemble the rest in order =====
    QueryDef("q81_drop_boilerplate",
      (s, dir) => Sequences.dropRepeatedBlocks(T.documents(s, dir),
          "doc_id", "text", blockSize = 16, minDf = 2)
        .withColumnRenamed("id", "doc_id"),
      Some(s"""
        WITH tk AS (SELECT doc_id, $duckToks AS tk FROM documents),
        nz AS (SELECT * FROM tk WHERE len(tk) > 0),
        blocks AS (SELECT doc_id, CAST(k AS BIGINT) AS chunk_ix,
                          array_to_string(tk[k*16 + 1 : k*16 + 16], ' ') AS chunk_text
                   FROM nz, unnest(range(0, (len(tk) - 1) // 16 + 1)) AS t(k)),
        hot AS (SELECT chunk_text FROM blocks
                GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
        keep AS (SELECT * FROM blocks
                 WHERE chunk_text NOT IN (SELECT chunk_text FROM hot))
        SELECT doc_id,
               string_agg(chunk_text, ' ' ORDER BY chunk_ix) AS text
        FROM keep GROUP BY doc_id""")),
  )
}
