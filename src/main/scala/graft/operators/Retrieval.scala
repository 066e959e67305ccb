package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Lexical retrieval over a (chunked) corpus — the query-time complement
  * of [[Sequences.chunkDocuments]]: BM25 ranking of documents/chunks for
  * a term query. Embedding ANN ([[Similarity]]) covers the semantic
  * side; production retrieval stacks run both and fuse.
  */
object Retrieval {

  /** BM25 top-k with a RATIONAL idf: idf_t = (N − df_t + 0.5)/(df_t + 0.5)
    * instead of its logarithm. Rankings are identical for single-term
    * queries and near-identical in practice (the log only compresses the
    * idf range), and the variant is exactly portable: +,×,÷ are
    * correctly-rounded IEEE ops in every engine, while `ln` carries no
    * such guarantee — a DuckDB/JVM ulp disagreement would make scores
    * engine-dependent. The standard log form is one `log(...)` wrap away
    * if cross-engine bit-equality is not required.
    *
    * Scale shape: corpus statistics (N, avg doc length, per-term df) are
    * ONE aggregation collapsed to a single row, read back as literals
    * (bounded control read — one row however large the corpus), so the
    * scoring pass is a single scan with a per-row column program: no
    * join, no shuffle before the final top-k window on (score, id),
    * which carries ids and scores only. Query terms are
    * configuration-sized (a user query), so per-term tf columns compile
    * into the scan projection. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    val toks = TextFunctions.tokens(col(textCol))
    val dl = size(toks).cast("double")
    def tfOf(term: String): Column =
      size(filter(toks, t => t === lit(term))).cast("double")
    // one pass for N, Σdl, and every term's df — over the BOUND token
    // column (__t), tokenized once per row in a pruned scan
    val statCols = Seq(count(lit(1)).cast("double").as("n"),
        sum(size(col("__t"))).cast("double").as("sumdl")) ++
      queryTerms.zipWithIndex.map { case (term, i) =>
        count(when(array_contains(col("__t"), term), lit(1)))
          .cast("double").as(s"df$i") }
    val stats = docs.select(toks.as("__t"))
      .agg(statCols.head, statCols.tail: _*).head()
    val n = stats.getDouble(0)
    val avgdl = stats.getDouble(1) / n
    val score = queryTerms.zipWithIndex.map { case (term, i) =>
      val df = stats.getDouble(2 + i)
      val idf = (n - df + 0.5) / (df + 0.5)
      val tf = tfOf(term)
      (tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(avgdl)))) * lit(idf)
    }.reduce(_ + _)
    // global top-k via orderBy+limit → TakeOrderedAndProject (per-
    // partition top-k, k-row driver merge) — NOT an unpartitioned
    // row_number window, which would sort every matching doc through
    // one task. The rank window after the limit sees ≤ k rows.
    val top = docs.select(col(idCol).as("id"), score.as("score"))
      .filter(col("score") > 0.0) // rank only docs matching ≥1 term
      .orderBy(desc("score"), col("id").asc)
      .limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("score"), col("id").asc)
    top.withColumn("rank", row_number().over(w))
  }

  /** Reciprocal-rank fusion of a lexical and a semantic ranking — the
    * standard hybrid-retrieval combiner: fused(d) = 1/(c + rank_a(d)) +
    * 1/(c + rank_b(d)), missing side contributing 0. Takes RANK columns,
    * not scores, so the two sides' score scales never need calibrating.
    *
    * Implemented as one full-outer join on id (both sides are top-k
    * lists — bounded), NOT union + groupBy-sum: a grouped float sum
    * accumulates in shuffle order, which would make the fused score
    * nondeterministic in the last ulp across runs; the join form fixes
    * the addition order. Output: (id, fused, rank), top `k`. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int,
              c: Double = 60.0): DataFrame = {
    val la = a.select(col("id"), col("rank").cast("double").as("__ra"))
    val lb = b.select(col("id"), col("rank").cast("double").as("__rb"))
    val fused = la.join(lb, Seq("id"), "full_outer")
      .select(col("id"),
        (coalesce(lit(1.0) / (lit(c) + col("__ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("__rb")), lit(0.0))).as("fused"))
      .orderBy(desc("fused"), col("id").asc)
      .limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("fused"), col("id").asc)
    fused.withColumn("rank", row_number().over(w))
  }
}
