package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Tables => T, Url}
import graft.functions.{CheckDsl, DateFunctions, HtmlFunctions, TextFunctions}
import graft.operators.{Checks, Dedup, Lookup, Relational, Similarity}
import graft.operators.Checks.Spec
import Catalog.QueryDef

/** Multimodal tier: binary payload handling with typed metadata,
  * frame sampling, stub decode/resize, media ANN composition.
  * Oracle-parity rules live in [[Catalog]]'s scaladoc. */
private[queries] object MultimodalQueries {
  import Catalog._

  val defs: Seq[QueryDef] = Seq(

    // ===== Multimodal: frame sampling over binary payloads =====
    QueryDef("q36_frame_sample",
      (s, dir) => {
        val media = T.documents(s, dir)
          .select(col("doc_id"), col("text").cast("binary").as("content"))
        graft.operators.Multimodal.sampleFrames(media, "doc_id", "content",
            frameSize = 64, everyN = 2)
          .select(col("media_id").as("doc_id"),
            col("frame_idx").cast("long").as("frame_idx"),
            Dedup.polyHash(col("frame").cast("string")).as("frame_hash"),
            length(col("frame")).cast("long").as("frame_len"))
      },
      Some("""
        WITH f AS (SELECT doc_id,
            unnest(list_filter(range(0, CAST(ceil(CAST(length(text) AS DOUBLE) / 64) AS INTEGER)),
                   i -> i % 2 = 0)) AS frame_idx,
            text FROM documents)
        SELECT doc_id, frame_idx,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range(1, length(substr(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64)) + 1),
              i -> CAST(ascii(substr(substr(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64), CAST(i AS INTEGER), 1)) AS BIGINT))),
            (a, b) -> (a * 31 + b) % 1000000007) AS frame_hash,
          length(substr(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64)) AS frame_len
        FROM f""")),

    // ===== Multimodal: stubbed decode → features → ANN composition =====
    // The stub featurizer is a folded byte histogram (L1-normalized in
    // float32) — arithmetic DuckDB reproduces exactly (REAL division is
    // IEEE binary32 in both engines), so this IS oracle-checkable.
    QueryDef("q37_media_ann",
      (s, dir) => {
        val media = T.documents(s, dir)
          .select(col("doc_id"), col("text").cast("binary").as("content"))
        val feats = graft.operators.Multimodal.featurize(media, "doc_id",
          "content", dim = 32)
        Similarity.bruteForceTopK(feats, feats.filter(col("media_id") < 4),
          "media_id", "features", k = 3)
          .withColumn("rank", col("rank").cast("long"))
      },
      Some {
        val d = duckDot("qv", "cv")
        val na = s"sqrt(${duckDot("qv", "qv")})"
        val nb = s"sqrt(${duckDot("cv", "cv")})"
        s"""
        WITH bk AS (SELECT doc_id, length(text) AS n,
            list_transform(range(1, length(text) + 1),
              i -> ascii(substr(text, CAST(i AS INTEGER), 1)) % 32) AS bs
          FROM documents),
        feats AS (SELECT doc_id,
            list_transform(range(0, 32), k ->
              CAST(len(list_filter(bs, b -> b = k)) AS REAL)
                / CAST(CASE WHEN n < 1 THEN 1 ELSE n END AS REAL)) AS fv
          FROM bk),
        q AS (SELECT doc_id AS query_id, fv AS qv FROM feats WHERE doc_id < 4),
        c AS (SELECT doc_id AS nbr_id, fv AS cv FROM feats),
        scored AS (SELECT query_id, nbr_id,
            CASE WHEN $na = 0.0 OR $nb = 0.0 THEN 0.0
                 ELSE $d / ($na * $nb) END AS sim
          FROM c CROSS JOIN q WHERE nbr_id != query_id)
        SELECT query_id, nbr_id, sim, "rank" FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, nbr_id) AS "rank" FROM scored)
        WHERE "rank" <= 3"""
      }),

    // ===== Multimodal: stubbed metadata decode (mapPartitions batch;
    // the stub's arithmetic is exactly expressible in SQL, so the
    // distributed plumbing gets a value-level oracle) =====
    QueryDef("q59_media_meta",
      (s, dir) => {
        val media = T.documents(s, dir).select(col("doc_id"),
          col("text").cast("binary").as("content"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"))
        graft.operators.Multimodal.withDecodedMeta(media, "doc_id",
            "content", "kind")
          .select(col("media_id"), col("kind"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("duration_ms"),
            col("sample_rate").cast("long").as("sample_rate"))
      },
      Some("""
        SELECT doc_id AS media_id,
               ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
               CAST(CASE doc_id % 3 WHEN 0 THEN (n % 640) + 1
                                    WHEN 1 THEN 0
                                    ELSE (n % 1920) + 1 END AS BIGINT) AS width,
               CAST(CASE doc_id % 3 WHEN 0 THEN (n % 480) + 1
                                    WHEN 1 THEN 0
                                    ELSE (n % 1080) + 1 END AS BIGINT) AS height,
               CAST(CASE doc_id % 3 WHEN 0 THEN 0
                                    WHEN 1 THEN n * 8
                                    ELSE n * 4 END AS BIGINT) AS duration_ms,
               CAST(CASE doc_id % 3 WHEN 1 THEN 16000 ELSE 0 END AS BIGINT)
                 AS sample_rate
        FROM (SELECT doc_id, length(text) AS n FROM documents)""")),

    // ===== Multimodal: stub resize (every-4th-byte downsample) =====
    QueryDef("q60_media_resize",
      (s, dir) => {
        val media = T.documents(s, dir).select(col("doc_id"),
          col("text").cast("binary").as("content"))
        graft.operators.Multimodal.resized(media, "doc_id", "content", 4)
          .select(col("media_id"),
            col("content").cast("string").as("resized"),
            length(col("content")).cast("long").as("n_bytes"))
      },
      Some("""
        SELECT doc_id AS media_id,
               array_to_string(list_transform(range(1, length(text) + 1, 4),
                 i -> substr(text, CAST(i AS INTEGER), 1)), '') AS resized,
               CAST(ceil(CAST(length(text) AS DOUBLE) / 4) AS BIGINT) AS n_bytes
        FROM documents""")),
  )
}
