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
      Some(s"""
        WITH f AS (SELECT doc_id,
            unnest(list_filter(range(0, CAST(ceil(CAST(length(text) AS DOUBLE) / 64) AS INTEGER)),
                   i -> i % 2 = 0)) AS frame_idx,
            text FROM documents)
        SELECT doc_id, frame_idx,
          ${Catalog.duckPolyHash("substr(text, CAST(frame_idx * 64 + 1 AS INTEGER), 64)")} AS frame_hash,
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

    // ===== Multimodal: metadata decode (mapPartitions batch). Image
    // rows carry a REAL PNG with id-derived dimensions, so the oracle's
    // arithmetic only matches if the javax.imageio codec reports the
    // ACTUAL decoded width/height; audio/video keep text payloads and
    // the documented stub (their codecs aren't in a stock JRE) =====
    QueryDef("q59_media_meta",
      (s, dir) => {
        val docs = T.documents(s, dir)
        val imgs = graft.operators.Multimodal.synthImages(
            docs.filter(pmod(col("doc_id"), lit(3)) === 0)
              .select(col("doc_id"),
                (pmod(col("doc_id"), lit(64)) + 1).as("w"),
                (pmod(col("doc_id"), lit(48)) + 1).as("h")),
            "doc_id", "w", "h")
          .withColumn("kind", lit("image"))
        val rest = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
          .select(col("doc_id").as("media_id"),
            col("text").cast("binary").as("content"),
            element_at(array(lit("image"), lit("audio"), lit("video")),
              (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"))
        graft.operators.Multimodal.withDecodedMeta(imgs.unionByName(rest),
            "media_id", "content", "kind")
          .select(col("media_id"), col("kind"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("duration_ms"),
            col("sample_rate").cast("long").as("sample_rate"))
      },
      Some("""
        SELECT doc_id AS media_id,
               ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
               CAST(CASE doc_id % 3 WHEN 0 THEN (doc_id % 64) + 1
                                    WHEN 1 THEN 0
                                    ELSE (n % 1920) + 1 END AS BIGINT) AS width,
               CAST(CASE doc_id % 3 WHEN 0 THEN (doc_id % 48) + 1
                                    WHEN 1 THEN 0
                                    ELSE (n % 1080) + 1 END AS BIGINT) AS height,
               CAST(CASE doc_id % 3 WHEN 0 THEN 0
                                    WHEN 1 THEN n * 8
                                    ELSE n * 4 END AS BIGINT) AS duration_ms,
               CAST(CASE doc_id % 3 WHEN 1 THEN 16000 ELSE 0 END AS BIGINT)
                 AS sample_rate
        FROM (SELECT doc_id, length(text) AS n FROM documents)""")),

    // ===== Multimodal: REAL image resize roundtrip — synth PNG at
    // (doc_id%64+8, doc_id%48+8) → ImageCodec resize by 2 → decode the
    // RESIZED payload; the oracle arithmetic only matches if both the
    // resize and the second decode report true dimensions =====
    QueryDef("q60_media_resize",
      (s, dir) => {
        val spec = T.documents(s, dir).select(col("doc_id"),
          (pmod(col("doc_id"), lit(64)) + 8).as("w"),
          (pmod(col("doc_id"), lit(48)) + 8).as("h"))
        val media = graft.operators.Multimodal.synthImages(
          spec, "doc_id", "w", "h")
        val rs = graft.operators.Multimodal.resizedImage(
          media, "media_id", "content", factor = 2)
        graft.operators.Multimodal.withDecodedMeta(
            rs.withColumn("kind", lit("image")), "media_id", "content", "kind")
          .select(col("media_id"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"))
      },
      Some("""
        SELECT doc_id AS media_id,
               CAST((doc_id % 64 + 8) // 2 AS BIGINT) AS width,
               CAST((doc_id % 48 + 8) // 2 AS BIGINT) AS height
        FROM documents""")),

    // ===== Multimodal: 64-bit dHash perceptual signature over REAL
    // decoded pixels — every hash BIT oracle-checked by replaying the
    // fixture PNG's deterministic pixel stream (64-bit LCG) in SQL and
    // re-deriving the gray-gradient grid. 50 distinct images × 10
    // copies each, so exact perceptual dups exist =====
    QueryDef("q134_image_dhash",
      (s, dir) => {
        val (media, _) = dhashMedia(s, dir)
        graft.operators.Multimodal.dHash(media, "media_id", "content")
      },
      Some(s"""
        WITH RECURSIVE ${duckDhashCtes}
        SELECT media_id, dhash FROM dh""")),

    // ===== Multimodal: perceptual image near-dup pairs — dHash +
    // pigeonhole hamming banding (4×16-bit chunks, exact at dist ≤ 3);
    // the oracle brute-forces all 125k hash pairs =====
    QueryDef("q135_image_neardup",
      (s, dir) => {
        val (media, _) = dhashMedia(s, dir)
        val hashes = graft.operators.Multimodal.dHash(
          media, "media_id", "content")
        graft.operators.Dedup.signatureNearDupPairs(hashes,
            "media_id", "dhash", maxDist = 3, chunks = 4, chunkBits = 16)
          .withColumn("hamming", col("hamming").cast("long"))
      },
      Some(dhashPairsOracle)),

    // ===== Multimodal: INCREMENTAL image near-dup — the same pairs
    // from a persisted HammingStore built by two ingests (each pair
    // emitted once, at the ingest of its later endpoint; the union is
    // exactly the one-shot q135 result) =====
    QueryDef("q143_image_neardup_incremental",
      (s, dir) => {
        val (media, _) = dhashMedia(s, dir)
        val root = java.nio.file.Files
          .createTempDirectory("graft_q143_").toString
        val store = new graft.operators.HammingStore(
          new graft.sources.Warehouse(s, root), "img",
          graft.operators.HammingConfig(maxDist = 3, nStoreBuckets = 4))
        // decode per BATCH (the incremental shape): filtering the dHash
        // output instead would decode the full corpus once per ingest —
        // the id filter cannot pass the mapPartitions barrier
        def batchHashes(pred: org.apache.spark.sql.Column) =
          graft.operators.Multimodal.dHash(
            media.filter(pred), "media_id", "content")
        val p1 = store.ingest(batchHashes(col("media_id") < 250),
          "media_id", "dhash")
        val p2 = store.ingest(batchHashes(col("media_id") >= 250),
          "media_id", "dhash")
        p1.unionByName(p2)
          .withColumn("hamming", col("hamming").cast("long"))
      },
      Some(dhashPairsOracle)),

    // ===== Multimodal: image DEDUP end-to-end — dHash → hamming pairs
    // → connected components → one representative kept per perceptual
    // cluster (the text tier's near-dedup loop, closed for images) =====
    QueryDef("q142_image_dedup",
      (s, dir) => {
        val (media, _) = dhashMedia(s, dir)
        val hashes = graft.operators.Multimodal.dHash(
          media, "media_id", "content")
        // id universe from the un-decoded media frame — taking it from
        // `hashes` would run the full decode pass a second time (dHash
        // emits exactly one row per input, so the ids are identical)
        graft.operators.Similarity.keepRepresentatives(
          media.select("media_id"), "media_id",
          graft.operators.Dedup.signatureNearDupPairs(hashes,
            "media_id", "dhash", maxDist = 3, chunks = 4, chunkBits = 16))
      },
      Some(s"""
        WITH RECURSIVE ${duckDhashCtes},
        pr AS (SELECT a.media_id AS id_a, b.media_id AS id_b
               FROM dh a JOIN dh b ON a.media_id < b.media_id
               WHERE bit_count(xor(a.dhash, b.dhash)) <= 3),
        edges AS (SELECT id_a AS src, id_b AS dst FROM pr
                  UNION SELECT id_b, id_a FROM pr),
        ccr AS (SELECT src AS id, src AS comp FROM edges
                UNION SELECT e2.dst, ccr.comp FROM ccr
                JOIN edges e2 ON ccr.id = e2.src),
        lab AS (SELECT id, min(comp) AS comp FROM ccr GROUP BY id)
        SELECT media_id FROM dh
        WHERE media_id NOT IN (SELECT id FROM lab WHERE comp < id)""")),

    // ===== Multimodal: REAL audio metadata roundtrip — synthWavs emits
    // actual RIFF/WAVE PCM16 bytes at id-derived (sample rate, frame
    // count); the oracle's arithmetic only matches if AudioCodec parses
    // the ACTUAL header fields back out (the q59 image pattern) =====
    QueryDef("q159_audio_meta",
      (s, dir) => {
        val spec = T.documents(s, dir).select(col("doc_id"),
          element_at(array(lit(8000), lit(16000), lit(44100)),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("sr"),
          (pmod(col("doc_id"), lit(200)) + 50).as("n"))
        val wavs = graft.operators.Multimodal.synthWavs(
          spec, "doc_id", "sr", "n").withColumn("kind", lit("audio"))
        graft.operators.Multimodal.withDecodedMeta(wavs,
            "media_id", "content", "kind")
          .select(col("media_id"), col("duration_ms"),
            col("sample_rate").cast("long").as("sample_rate"))
      },
      Some("""
        SELECT doc_id AS media_id,
               CAST((doc_id % 200 + 50) * 1000 // sr AS BIGINT)
                 AS duration_ms,
               CAST(sr AS BIGINT) AS sample_rate
        FROM (SELECT doc_id,
                [8000, 16000, 44100][CAST(doc_id % 3 AS INTEGER) + 1] AS sr
              FROM documents)""")),

    // ===== Multimodal: ANN over REAL audio features — the energy
    // envelope AudioCodec decodes from actual PCM frames. Every window
    // sum is exact (dyadic |sample| values, binary64 headroom), so the
    // oracle replays sample stream → envelope → cosine bit-for-bit
    // (the q37/q134 replay discipline, now through a real codec) =====
    QueryDef("q160_audio_ann",
      (s, dir) => {
        val spec = T.documents(s, dir).select(col("doc_id"),
          lit(8000).as("sr"), (pmod(col("doc_id"), lit(400)) + 100).as("n"))
        val wavs = graft.operators.Multimodal.synthWavs(
          spec, "doc_id", "sr", "n")
        val feats = graft.operators.Multimodal.audioFeatures(
          wavs, "media_id", "content", dim = 8)
        Similarity.bruteForceTopK(feats,
            feats.filter(col("media_id") < 4), "media_id", "features", k = 3)
          .withColumn("rank", col("rank").cast("long"))
      },
      Some {
        val d = duckDot("qv", "cv")
        val na = s"sqrt(${duckDot("qv", "qv")})"
        val nb = s"sqrt(${duckDot("cv", "cv")})"
        s"""
        WITH spec AS (SELECT doc_id,
            CAST(doc_id % 400 + 100 AS BIGINT) AS n FROM documents),
        sa AS (SELECT doc_id, n,
            list_transform(range(0, n),
              i -> abs(((doc_id + 1) * (i + 7)) % 65536 - 32768)) AS a
          FROM spec),
        env AS (SELECT doc_id,
            list_transform(range(0, 8), k ->
              CAST(list_sum(a[CAST(k * n // 8 AS INTEGER) + 1 :
                              CAST((k + 1) * n // 8 AS INTEGER)])
                AS DOUBLE)) AS sums
          FROM sa),
        feats AS (SELECT doc_id,
            list_transform(sums, v ->
              CAST(v / list_reduce(sums, (x, y) -> x + y) AS REAL)) AS fv
          FROM env),
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
  ) :+ videoNearDupDef

  /** The defs entry for q144 (appended to [[defs]] in the Seq above
    * would shadow the helpers below — registered via concatenation). */
  private[queries] def videoNearDupDef: Catalog.QueryDef =
    // ===== Multimodal: video-style near-dup via frame fingerprints —
    // sample fixed-size frames, fingerprint each (rolling hash), exact
    // set-similarity join over the per-media fingerprint sets =====
    Catalog.QueryDef("q144_video_neardup",
      (s, dir) => {
        val media = T.documents(s, dir)
          .select(col("doc_id").as("media_id"),
            // printable-ASCII payloads so byte frames and char frames
            // agree across engines (text bytes stand in for the stream)
            regexp_replace(col("text"), "[^ -~]", "")
              .cast("binary").as("content"))
        val frames = graft.operators.Multimodal.sampleFrames(
          media, "media_id", "content", frameSize = 32, everyN = 2)
        val fsets = frames.groupBy("media_id")
          .agg(collect_list(graft.operators.Dedup.polyHash(
            col("frame").cast("string"))).as("fset"))
        graft.operators.Dedup.setJaccardPairs(
          fsets, "media_id", "fset", threshold = 0.5)
      },
      Some {
        // outer lambda var MUST NOT be `i` — duckPolyHash's inner fold
        // variable is `i` and would shadow it inside the substr
        val ph = Catalog.duckPolyHash(
          "substr(t, CAST(fi * 32 + 1 AS INTEGER), 32)")
        s"""
        WITH san AS (SELECT doc_id,
                       regexp_replace(text, '[^ -~]', '', 'g') AS t
                     FROM documents),
        fr AS (SELECT doc_id, list_distinct(list_transform(
                 list_filter(range(0,
                   CAST(ceil(length(t) / 32.0) AS BIGINT)),
                   fi -> fi % 2 = 0),
                 fi -> $ph)) AS fs
               FROM san),
        p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                len(list_intersect(a.fs, b.fs)) AS c,
                len(a.fs) AS sa, len(b.fs) AS sb
              FROM fr a JOIN fr b ON a.doc_id < b.doc_id)
        SELECT id_a, id_b,
               CAST(c AS DOUBLE) / CAST(sa + sb - c AS DOUBLE) AS jaccard
        FROM p
        WHERE CAST(c AS DOUBLE) / CAST(sa + sb - c AS DOUBLE) >= 0.5"""
      })

  /** q135/q143's shared oracle: all dHash pairs at hamming ≤ 3,
    * brute-forced over the bit-exact replayed hashes. */
  private def dhashPairsOracle: String = s"""
        WITH RECURSIVE ${duckDhashCtes}
        SELECT a.media_id AS id_a, b.media_id AS id_b,
               CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
        FROM dh a JOIN dh b ON a.media_id < b.media_id
        WHERE bit_count(xor(a.dhash, b.dhash)) <= 3"""

  /** q134/q135 fixture: 50 distinct REAL PNGs (dims and seed a pure
    * function of `g = doc_id % 50`), each shared by 10 docs — exact
    * perceptual duplicates with distinct media ids. */
  private def dhashMedia(s: org.apache.spark.sql.SparkSession,
                         dir: String) = {
    val docs = T.documents(s, dir)
      .select(col("doc_id"), pmod(col("doc_id"), lit(50)).as("g"))
    val grp = docs.select("g").distinct()
      .select(col("g"), (pmod(col("g"), lit(11)) + 20).as("w"),
        (pmod(col("g"), lit(7)) + 16).as("h"))
    val imgs = graft.operators.Multimodal.synthImages(grp, "g", "w", "h")
      .withColumnRenamed("media_id", "g")
    val media = docs.join(imgs, Seq("g"))
      .select(col("doc_id").as("media_id"), col("content"))
    (media, docs)
  }

  /** DuckDB replay of [[graft.operators.Multimodal.dHash]] over the
    * q134 fixture: the PNG pixel stream is `pngBytes`' 64-bit LCG
    * (`s' = s·6364136223846793005 + 1442695040888963407 mod 2^64`,
    * pixel = bits 40..63 of the state, walked row-major from seed = g),
    * so HUGEINT arithmetic re-derives every gray sample, the 9×8 grid
    * gradient re-derives every hash bit, and the signed-BIGINT fold
    * matches the Spark hash exactly. */
  private def duckDhashCtes: String = s"""
        dims AS (SELECT DISTINCT doc_id % 50 AS g,
                        (doc_id % 50) % 11 + 20 AS w,
                        (doc_id % 50) % 7 + 16 AS h FROM documents),
        walk(g, n, s) AS (
          SELECT g, 0, CAST(g AS HUGEINT) FROM dims
          UNION ALL
          SELECT w.g, w.n + 1,
                 (w.s * 6364136223846793005 + 1442695040888963407)
                   % 18446744073709551616
          FROM walk w JOIN dims d ON w.g = d.g WHERE w.n < d.w * d.h),
        px AS (SELECT g, n,
                 CAST((s // 1099511627776) % 16777216 AS BIGINT) AS p
               FROM walk WHERE n >= 1),
        gray AS (SELECT g, n,
                   (((p // 65536) % 256) + ((p // 256) % 256) + (p % 256)) // 3
                     AS gv
                 FROM px),
        gpt AS (SELECT d.g, ii.i, jj.j,
                       ((jj.j * d.h) // 8) * d.w + ((ii.i * d.w) // 9) + 1 AS n
                FROM dims d, range(0, 9) ii(i), range(0, 8) jj(j)),
        gsam AS (SELECT p.g, p.i, p.j, gr.gv FROM gpt p
                 JOIN gray gr ON p.g = gr.g AND p.n = gr.n),
        hb AS (SELECT l.g, CAST(l.j * 8 + l.i AS INTEGER) AS bit
               FROM gsam l JOIN gsam r
                 ON l.g = r.g AND l.j = r.j AND r.i = l.i + 1
               WHERE r.gv > l.gv),
        hu AS (SELECT d.g, COALESCE(s.b, CAST(0 AS HUGEINT)) AS b
               FROM dims d LEFT JOIN
                 (SELECT g, SUM(CAST(power(2, bit) AS HUGEINT)) AS b
                  FROM hb GROUP BY g) s ON d.g = s.g),
        dh AS (SELECT d.doc_id AS media_id,
                      CAST(CASE WHEN h.b >= 9223372036854775808
                                THEN h.b - 18446744073709551616
                                ELSE h.b END AS BIGINT) AS dhash
               FROM documents d JOIN hu h ON d.doc_id % 50 = h.g)"""
}
