package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Tables => T}
import graft.operators.QualityModels
import Catalog.QueryDef
import Catalog.{duckPolyHash, duckToks, sqlList}
import graft.functions.TextFunctions

/** Model-based quality tier: corpus-LM fluency and DSIR-style
  * importance selection — the signals a curation pipeline uses where a
  * perplexity bucket or a trained classifier would sit, kept in the
  * library's exact-arithmetic idiom (see [[graft.operators.QualityModels]]).
  * Oracle-parity rules live in [[Catalog]]'s scaladoc. */
private[queries] object QualityQueries {

  /** Hashed uni+bigram feature-stream SQL — ONE definition of the
    * parity-critical fragment (mirrors QualityModels.featStream),
    * shared by q101/q102 (via [[featureCtes]]) and q151 (via
    * [[hashedPerceptronCtes]]); emits `{pfx}tk` and `{pfx}fs` over
    * `docsRel`, which must expose (doc_id, text). The bigram string is
    * materialized in a subquery BEFORE hashing: duckPolyHash's
    * list_transform lambda binds `i`, so inlining an expression that
    * references the outer unnest index `i` would be silently captured
    * by the lambda variable (hash of the i-th char of the i-th bigram —
    * depends only on token lengths; caught by the local oracle gate). */
  private def hashedFeatureStreamCtes(pfx: String, docsRel: String): String =
    s"""${pfx}tk AS (SELECT doc_id, $duckToks AS tk FROM $docsRel),
        ${pfx}fs AS (
          SELECT doc_id, ${duckPolyHash("tok")} % 4096 AS f
          FROM (SELECT doc_id, unnest(tk) AS tok FROM ${pfx}tk)
          UNION ALL
          SELECT doc_id, ${duckPolyHash("bgs")} % 4096 AS f
          FROM (SELECT doc_id, tk[i] || ' ' || tk[i+1] AS bgs
                FROM ${pfx}tk, unnest(range(1, len(tk))) AS u(i)))"""

  /** The q101/q102 DSIR scaffolding over the shared feature stream. */
  private val featureCtes: String =
    s"""${hashedFeatureStreamCtes("", "documents")},
        tc AS (SELECT f, CAST(count(*) AS BIGINT) AS cnt_t
               FROM fs WHERE doc_id % 3 = 0 GROUP BY 1),
        pc AS (SELECT f, CAST(count(*) AS BIGINT) AS cnt_p
               FROM fs GROUP BY 1),
        tots AS (SELECT
            CAST((SELECT count(*) FROM fs WHERE doc_id % 3 = 0) AS DOUBLE)
              AS t_tot,
            CAST((SELECT count(*) FROM fs) AS DOUBLE) AS p_tot),
        pd AS (SELECT fs.doc_id, count(*) AS n_features,
                      CAST(sum(coalesce(tc.cnt_t, 0)) AS BIGINT)
                        AS target_mass,
                      CAST(sum(coalesce(pc.cnt_p, 0)) AS BIGINT) AS raw_mass
               FROM fs LEFT JOIN tc USING (f) LEFT JOIN pc USING (f)
               GROUP BY 1),
        scored AS (SELECT d.doc_id,
               coalesce(pd.n_features, 0) AS n_features,
               coalesce(pd.target_mass, 0) AS target_mass,
               coalesce(pd.raw_mass, 0) AS raw_mass,
               CASE WHEN pd.n_features IS NULL OR pd.n_features = 0 THEN 0.0
                    ELSE (pd.target_mass::DOUBLE / t_tot
                          - pd.raw_mass::DOUBLE / p_tot)
                         / pd.n_features::DOUBLE
               END AS score
          FROM (SELECT doc_id FROM documents) d
          LEFT JOIN pd USING (doc_id), tots)"""

  val defs: Seq[QueryDef] = Seq(

    // ===== bigram-LM fluency: fraction of token transitions the corpus
    // bigram model finds plausible (cnt >= 2 and conditional probability
    // >= 1/100, tested as an integer cross-multiplication) =====
    QueryDef("q100_bigram_fluency",
      (s, dir) => QualityModels.bigramFluency(T.documents(s, dir),
          "doc_id", "text", minCount = 2L, ratioDen = 100L)
        .withColumnRenamed("id", "doc_id"),
      Some(s"""
        WITH tk AS (SELECT doc_id, $duckToks AS tk FROM documents),
        bg AS (SELECT doc_id, tk[i] AS t1, tk[i+1] AS t2
               FROM tk, unnest(range(1, len(tk))) AS u(i)),
        c AS (SELECT t1, t2, CAST(count(*) AS BIGINT) AS cbg
              FROM bg GROUP BY 1, 2),
        p AS (SELECT t1, CAST(count(*) AS BIGINT) AS cpre
              FROM bg GROUP BY 1),
        pd AS (SELECT bg.doc_id, count(*) AS n_bigrams,
                      count(CASE WHEN c.cbg >= 2 AND c.cbg * 100 >= p.cpre
                                 THEN 1 END) AS n_fluent
               FROM bg JOIN c USING (t1, t2) JOIN p USING (t1)
               GROUP BY 1)
        SELECT d.doc_id,
               coalesce(pd.n_bigrams, 0) AS n_bigrams,
               coalesce(pd.n_fluent, 0) AS n_fluent,
               CASE WHEN pd.n_bigrams IS NULL OR pd.n_bigrams = 0 THEN 0.0
                    ELSE pd.n_fluent::DOUBLE / pd.n_bigrams::DOUBLE
               END AS fluency
        FROM (SELECT doc_id FROM documents) d
        LEFT JOIN pd USING (doc_id)""")),

    // ===== The Gopher/MassiveWeb quality-rule battery (Rae et al.
    // 2021, appendix A) — per-doc statistics, per-rule booleans, and
    // the conjunction, all exact counts over single divisions so the
    // struct replays bit-identically. minWords=50 splits this corpus
    // (word counts run 10–99); the line/symbol rules are exercised by
    // TextFunctionsSpec fixtures (the synthetic corpus is single-line
    // and symbol-free) =====
    QueryDef("q167_gopher_rules",
      (s, dir) => T.documents(s, dir)
        .select(col("doc_id"),
          TextFunctions.gopherRules(col("text"),
            TextFunctions.tokens(col("text"))).as("__g"))
        .select(col("doc_id"), col("__g.*")),
      Some(s"""
        WITH tkq AS (SELECT doc_id, text, $duckToks AS tk FROM documents),
        st AS (SELECT doc_id,
            CAST(len(tk) AS BIGINT) AS n_words,
            list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(tk, w -> CAST(len(w) AS BIGINT))),
              (a, x) -> a + x) AS sum_len,
            CAST(len(text) - len(regexp_replace(text, '#', '', 'g'))
              AS BIGINT) AS n_hash,
            CAST((len(text) -
              len(regexp_replace(text, '\\.\\.\\.', '', 'g'))) // 3
              AS BIGINT) AS n_ell,
            list_filter(string_split(text, chr(10)),
              l -> len(trim(l)) > 0) AS lines,
            CAST(len(list_filter(tk, w -> regexp_matches(w, '[a-z]')))
              AS BIGINT) AS n_alpha,
            CAST(len(list_intersect(list_distinct(tk),
              ['the','be','to','of','and','that','have','with']))
              AS BIGINT) AS n_stop_hits
          FROM tkq),
        r AS (SELECT doc_id, n_words,
            CASE WHEN n_words > 0
                 THEN CAST(sum_len AS DOUBLE) / CAST(n_words AS DOUBLE)
                 ELSE 0.0 END AS mean_word_len,
            CASE WHEN n_words > 0
                 THEN CAST(n_hash AS DOUBLE) / CAST(n_words AS DOUBLE)
                 ELSE 0.0 END AS hash_ratio,
            CASE WHEN n_words > 0
                 THEN CAST(n_ell AS DOUBLE) / CAST(n_words AS DOUBLE)
                 ELSE 0.0 END AS ellipsis_ratio,
            CASE WHEN len(lines) > 0
                 THEN CAST(len(list_filter(lines, l ->
                      regexp_matches(trim(l), '^[•\\-\\*]')))
                      AS DOUBLE) / CAST(len(lines) AS DOUBLE)
                 ELSE 0.0 END AS bullet_line_frac,
            CASE WHEN len(lines) > 0
                 THEN CAST(len(list_filter(lines, l ->
                      regexp_matches(trim(l), '(\\.\\.\\.|…)$$')))
                      AS DOUBLE) / CAST(len(lines) AS DOUBLE)
                 ELSE 0.0 END AS ellipsis_line_frac,
            CASE WHEN n_words > 0
                 THEN CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE)
                 ELSE 0.0 END AS alpha_word_frac,
            n_stop_hits
          FROM st)
        SELECT doc_id, n_words, mean_word_len, hash_ratio,
          ellipsis_ratio, bullet_line_frac, ellipsis_line_frac,
          alpha_word_frac, n_stop_hits,
          n_words >= 50 AND n_words <= 100000 AS r_words,
          mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS r_mean_len,
          hash_ratio <= 0.1 AND ellipsis_ratio <= 0.1 AS r_symbol,
          bullet_line_frac <= 0.9 AS r_bullet,
          ellipsis_line_frac <= 0.3 AS r_ell_line,
          alpha_word_frac >= 0.8 AS r_alpha,
          n_stop_hits >= 2 AS r_stop,
          (n_words >= 50 AND n_words <= 100000)
            AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
            AND (hash_ratio <= 0.1 AND ellipsis_ratio <= 0.1)
            AND bullet_line_frac <= 0.9
            AND ellipsis_line_frac <= 0.3
            AND alpha_word_frac >= 0.8
            AND n_stop_hits >= 2 AS pass
        FROM r""")),

    // ===== DSIR-style importance score vs a target corpus (the
    // doc_id % 3 = 0 slice stands in for the curated reference set) =====
    QueryDef("q101_importance_score",
      (s, dir) => {
        val d = T.documents(s, dir)
        QualityModels.importanceScore(d,
            d.filter(col("doc_id") % 3 === 0), "doc_id", "text",
            numFeatures = 4096)
          .withColumnRenamed("id", "doc_id")
      },
      Some(s"""
        WITH $featureCtes
        SELECT doc_id, n_features, target_mass, raw_mass, score
        FROM scored""")),

    // ===== DSIR importance selection: keep the 25 pool docs best
    // aligned with the target distribution =====
    QueryDef("q102_importance_select",
      (s, dir) => {
        val d = T.documents(s, dir)
        QualityModels.importanceSelect(d,
            d.filter(col("doc_id") % 3 === 0), "doc_id", "text",
            numFeatures = 4096, n = 25)
          .withColumnRenamed("id", "doc_id")
          .withColumn("rank", col("rank").cast("long"))
      },
      Some(s"""
        WITH $featureCtes
        SELECT doc_id, score,
               CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                 AS BIGINT) AS rank
        FROM scored
        QUALIFY rank <= 25""")),

    // ===== source reputation: per-source doc counts, corpus-wide
    // syndication share, and the floor(q·2^20) exact-integer mean of the
    // row-local quality score (order-independent → engine-portable) =====
    QueryDef("q106_source_stats",
      (s, dir) => graft.operators.CorpusStats.sourceStats(
        T.documents(s, dir)
          .withColumn("__k", substring(col("text"), 1, 40)),
        "doc_id", "text", "source", keyCol = Some("__k")),
      Some(s"""
        WITH $sourceStatCtes
        SELECT source, count(*) AS n_docs,
          count(CASE WHEN cnt > 1 THEN 1 END) AS n_dup,
          CAST(sum(CAST(floor(q * 1048576.0) AS BIGINT)) AS DOUBLE)
            / 1048576.0 / CAST(count(*) AS DOUBLE) AS mean_quality,
          CAST(count(CASE WHEN cnt > 1 THEN 1 END) AS DOUBLE)
            / CAST(count(*) AS DOUBLE) AS dup_share
        FROM c GROUP BY source""")),

    // ===== source reputation gate: keep documents only from sources
    // passing the mean-quality / dup-share thresholds (C4/RefinedWeb
    // drop whole hosts, not single pages) =====
    QueryDef("q107_source_filter",
      (s, dir) => graft.operators.CorpusStats.sourceFilter(
          T.documents(s, dir)
            .withColumn("__k", substring(col("text"), 1, 40)),
          "doc_id", "text", "source",
          minQuality = 0.49, maxDupShare = 0.10, keyCol = Some("__k"))
        .select("doc_id", "source"),
      Some(s"""
        WITH $sourceStatCtes
        SELECT doc_id, source FROM documents
        WHERE source IN (
          SELECT source FROM c GROUP BY source
          HAVING CAST(sum(CAST(floor(q * 1048576.0) AS BIGINT)) AS DOUBLE)
                   / 1048576.0 / CAST(count(*) AS DOUBLE) >= 0.49
             AND CAST(count(CASE WHEN cnt > 1 THEN 1 END) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) <= 0.10)""")),
  ) ++ reportDefs ++ classifierDefs

  /** q112 is appended to defs via ++ to keep the two source-reputation
    * queries and the report adjacent in the file. */
  private[queries] def reportDefs: Seq[QueryDef] = Seq(
    // ===== corpus report: the dataset-card header numbers, one exact
    // aggregation pass, every figure order-independent =====
    QueryDef("q112_corpus_report",
      (s, dir) => graft.operators.CorpusStats.corpusReport(
        T.documents(s, dir), "doc_id", "text"),
      Some(s"""
        WITH x AS (SELECT text,
            CAST(len($duckToks) AS BIGINT) AS ntok,
            CAST(length(text) AS DOUBLE) AS len,
            CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
              AS alpha,
            CAST(len(list_filter($duckToks,
              t -> list_contains(${sqlList(TextFunctions.stopwords("en"))}, t)))
              AS DOUBLE) AS hits
          FROM documents),
        q AS (SELECT text, ntok,
            ((CASE WHEN len > 0 THEN alpha / len ELSE 0.0 END
              + CASE WHEN ntok > 0 THEN hits / CAST(ntok AS DOUBLE)
                     ELSE 0.0 END)
              + least(len / 500.0, 1.0)) / 3.0 AS q
          FROM x)
        SELECT count(*) AS n_docs,
          count(CASE WHEN ntok = 0 THEN 1 END) AS n_empty,
          count(DISTINCT text) AS n_distinct,
          CAST(sum(ntok) AS BIGINT) AS total_tokens,
          CAST(sum(CAST(floor(q * 1048576.0) AS BIGINT)) AS DOUBLE)
            / 1048576.0 / CAST(count(*) AS DOUBLE) AS mean_quality,
          CAST(sum(ntok) AS DOUBLE) / CAST(count(*) AS DOUBLE)
            AS mean_tokens
        FROM q""")),
  )

  /** The trained-classifier tier: q150 trains the exact-integer batch
    * perceptron on the even-id half of `documents` against a planted
    * linearly-shaped label (stopword-rich prose vs keyword-list spam:
    * label = +1 iff 5·stopword_hits ≥ token_count) and scores EVERY
    * document — the oracle re-trains from scratch in DuckDB by
    * unrolling the iterations as numbered CTEs (the kmeansCtes idiom)
    * and must reproduce the weights, margins, and decisions BIT-FOR-BIT
    * (integer features ⇒ order-independent training; the whole point of
    * [[QualityModels.trainPerceptron]]'s arithmetic). */
  // `final` + literal = compile-time constant, immune to the object
  // init-order trap (`defs` above evaluates classifierDefs at object
  // init, BEFORE plain vals declared below it — a plain val here reads
  // as 0 and silently generates a zero-iteration oracle)
  private final val classifierIters = 4

  private[queries] def classifierDefs: Seq[QueryDef] = Seq(
    QueryDef("q150_quality_classifier",
      (s, dir) => {
        val feats = QualityModels.classifierFeatures(
          T.documents(s, dir), "doc_id", "text")
        val labeled = feats.withColumn("label",
          when(col("f_stop") * 5L >= col("f_tokens"), 1L).otherwise(-1L))
        val w = QualityModels.trainPerceptron(
          labeled.filter(col("id") % 2 === 0), "label",
          iters = classifierIters)
        val m = QualityModels.perceptronMargin(w.toSeq)
        labeled.select(col("id").as("doc_id"), m.as("margin"),
          when(m > 0, 1L).otherwise(-1L).as("pred"), col("label"))
      },
      Some {
        val margin = "(w.w0*l.f_bias + w.w1*l.f_tokens + w.w2*l.f_stop" +
          " + w.w3*l.f_digit + w.w4*l.f_distinct + w.w5*l.f_maxlen)"
        s"""
        WITH ${perceptronCtes(classifierIters)}
        SELECT l.doc_id,
               $margin AS margin,
               CASE WHEN $margin > 0 THEN 1::BIGINT
                    ELSE -1::BIGINT END AS pred,
               l.label
        FROM cl l CROSS JOIN cw$classifierIters w"""
      }),

    // ===== the fastText-shaped sibling: hashed word uni+bigram
    // features, weight TABLE instead of six hand features — q151
    // retrains in DuckDB via unrolled full-outer-join weight folds and
    // must reproduce every margin and decision exactly =====
    QueryDef("q151_hashed_classifier",
      (s, dir) => {
        val docs = T.documents(s, dir)
        val toks = TextFunctions.tokens(coalesce(col("text"), lit("")))
        val labeled = docs.select(col("doc_id"), col("text"),
          (when(TextFunctions.stopwordHitsFromTokens(toks,
              TextFunctions.stopwords("en")) * 5 >= size(toks), 1L)
            .otherwise(-1L)).as("label"))
        val w = QualityModels.trainHashedPerceptron(
          labeled.filter(col("doc_id") % 2 === 0), "doc_id", "text",
          "label", numFeatures = 4096, iters = hashedClassifierIters)
        QualityModels.hashedMargin(docs, "doc_id", "text", w)
          .select(col("id").as("doc_id"), col("margin"),
            when(col("margin") > 0, 1L).otherwise(-1L).as("pred"))
      },
      Some(s"""
        WITH ${hashedPerceptronCtes(hashedClassifierIters)}
        SELECT d.doc_id,
               coalesce(pm.m, 0)::BIGINT AS margin,
               CASE WHEN coalesce(pm.m, 0) > 0 THEN 1::BIGINT
                    ELSE -1::BIGINT END AS pred
        FROM documents d
        LEFT JOIN (SELECT h.doc_id, sum(coalesce(w.w, 0)) AS m
                   FROM hfs h
                   LEFT JOIN hw$hashedClassifierIters w USING (f)
                   GROUP BY h.doc_id) pm USING (doc_id)""")),
  )

  private final val hashedClassifierIters = 3

  /** Unrolled hashed-ngram perceptron training: `hfs` is the portable
    * hashed uni+bigram occurrence stream over ALL documents (bigram
    * strings materialized before hashing — the [[featureCtes]] lambda-
    * capture rule), `tfs` the labeled training half, and each
    * `hm{i}`/`hu{i}`/`hw{i}` triple applies one exact-integer update to
    * the weight TABLE via a full-outer fold — exposes `hfs` and
    * `hw{iters}`. `hw0` is the empty table (zero weights ≡ absent). */
  private def hashedPerceptronCtes(iters: Int): String = {
    val stops = sqlList(TextFunctions.stopwords("en"))
    val sb = new StringBuilder
    sb ++= s"""hctx AS (SELECT doc_id, coalesce(text, '') AS text
               FROM documents),
        ${hashedFeatureStreamCtes("h", "hctx")},
        hlab AS (SELECT doc_id,
            CASE WHEN 5 * len(list_filter(tk,
                   t -> list_contains($stops, t))) >= len(tk)
                 THEN 1::BIGINT ELSE -1::BIGINT END AS y
          FROM htk),
        tfs AS (SELECT h.doc_id, h.f, l.y
                FROM hfs h JOIN hlab l USING (doc_id)
                WHERE h.doc_id % 2 = 0),
        hw0 AS (SELECT CAST(NULL AS BIGINT) AS f, CAST(NULL AS BIGINT) AS w
                WHERE FALSE)"""
    for (i <- 1 to iters) {
      sb ++= s""",
        hm$i AS (SELECT t.doc_id, max(t.y) AS y,
                        sum(coalesce(w.w, 0)) AS m
                 FROM tfs t LEFT JOIN hw${i - 1} w USING (f)
                 GROUP BY t.doc_id),
        hu$i AS (SELECT t.f, sum(t.y)::BIGINT AS u
                 FROM tfs t JOIN hm$i m
                   ON t.doc_id = m.doc_id AND m.y * m.m <= 0
                 GROUP BY t.f),
        hw$i AS (SELECT coalesce(w.f, u.f) AS f,
                        (coalesce(w.w, 0) + coalesce(u.u, 0))::BIGINT AS w
                 FROM hw${i - 1} w FULL OUTER JOIN hu$i u ON w.f = u.f)"""
    }
    sb.toString
  }

  /** Unrolled batch-perceptron training (ONE definition of the
    * parity-critical feature SQL): `cf` mirrors
    * [[QualityModels.classifierFeatures]] column for column, `cl` adds
    * the planted label, `cw0` is the zero weight row and each
    * `cu{i}`/`cw{i}` pair applies one exact-integer update over the
    * even-id training half — exposes `cw{iters}` and `cl`. */
  private def perceptronCtes(iters: Int): String = {
    val stops = sqlList(TextFunctions.stopwords("en"))
    val featExprs = Seq("l.f_bias", "l.f_tokens", "l.f_stop", "l.f_digit",
      "l.f_distinct", "l.f_maxlen")
    val sb = new StringBuilder
    sb ++= s"""ctx AS (SELECT doc_id, coalesce(text, '') AS text
               FROM documents),
        cf AS (SELECT doc_id,
            1::BIGINT AS f_bias,
            least(len($duckToks), 1024)::BIGINT AS f_tokens,
            least(len(list_filter($duckToks,
              t -> list_contains($stops, t))), 1024)::BIGINT AS f_stop,
            least(length(text) - length(
              regexp_replace(text, '[0-9]', '', 'g')), 1024)::BIGINT
              AS f_digit,
            least(len(list_distinct($duckToks)), 1024)::BIGINT
              AS f_distinct,
            least(coalesce(list_max(list_transform($duckToks,
              t -> len(t))), 0), 64)::BIGINT AS f_maxlen
          FROM ctx),
        cl AS (SELECT *, CASE WHEN f_stop * 5 >= f_tokens
                              THEN 1::BIGINT ELSE -1::BIGINT END AS label
               FROM cf),
        cw0 AS (SELECT ${featExprs.indices.map(j =>
          s"0::BIGINT AS w$j").mkString(", ")})"""
    val margin = featExprs.zipWithIndex
      .map { case (f, j) => s"w.w$j*$f" }.mkString(" + ")
    for (i <- 1 to iters) {
      val upds = featExprs.zipWithIndex.map { case (f, j) =>
        s"coalesce(sum(CASE WHEN l.label * ($margin) <= 0 " +
          s"THEN l.label * $f END), 0)::BIGINT AS u$j"
      }
      sb ++= s""",
        cu$i AS (SELECT ${upds.mkString(",\n            ")}
          FROM cl l CROSS JOIN cw${i - 1} w WHERE l.doc_id % 2 = 0),
        cw$i AS (SELECT ${featExprs.indices.map(j =>
          s"w.w$j + u.u$j AS w$j").mkString(", ")}
          FROM cw${i - 1} w CROSS JOIN cu$i u)"""
    }
    sb.toString
  }

  /** DuckDB mirror of [[graft.operators.CorpusStats.sourceStats]]'s
    * per-document stage: the q17 quality expression plus the corpus-wide
    * exact-dup count window (partition by full text — the oracle may
    * shuffle text; the Spark side keys the same count on the 128-bit
    * hash pair). Shared by q106/q107 — the quality SQL is
    * parity-critical and must not fork. */
  private def sourceStatCtes: String =
    s"""x AS (SELECT doc_id, source, text,
            CAST(length(text) AS DOUBLE) AS len,
            CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
              AS alpha,
            CAST(len($duckToks) AS DOUBLE) AS ntok,
            CAST(len(list_filter($duckToks,
              t -> list_contains(${sqlList(TextFunctions.stopwords("en"))}, t)))
              AS DOUBLE) AS hits
          FROM documents),
        qd AS (SELECT doc_id, source, text,
            ((CASE WHEN len > 0 THEN alpha / len ELSE 0.0 END
              + CASE WHEN ntok > 0 THEN hits / ntok ELSE 0.0 END)
              + least(len / 500.0, 1.0)) / 3.0 AS q
          FROM x),
        c AS (SELECT source, q,
                     count(*) OVER (PARTITION BY substr(text, 1, 40)) AS cnt
              FROM qd)"""
}
