package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Shaping curated text into model-ready sequences — the step between a
  * curated corpus and a training run (and, for `chunkDocuments`, between
  * a corpus and a retrieval index).
  *
  * Both operators are row-local column programs (chunking) or reuse the
  * two-phase global prefix sum (packing) — no driver loops, no
  * single-partition windows, nothing that degrades at 100×.
  */
object Sequences {

  /** Split each document into fixed-size token windows with `overlap`
    * tokens shared between consecutive chunks — the retrieval-chunking
    * primitive (embedding indexes want bounded, overlapping windows, not
    * whole documents).
    *
    * Chunks start at token offsets 0, size−overlap, 2(size−overlap), …
    * for as long as a chunk still covers at least one NEW token (a tail
    * that would sit entirely inside the previous chunk's overlap is not
    * emitted); the last chunk may be shorter than `size`. Zero-token
    * documents produce no chunks.
    * Output: (id, chunk_ix, chunk_text, n_tokens), one row per chunk —
    * a pure per-row explode: tokenization and slicing happen inside one
    * whole-stage-codegen projection, and the output is at most
    * ntok/(size−overlap)+1 rows per doc, so the blow-up factor is a
    * config constant, not data-dependent. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     size: Int, overlap: Int): DataFrame = {
    require(size > 0, s"chunk size must be positive, got $size")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap for size $size")
    val step = size - overlap
    // tokens bound to a column first (lambda-capture rule): the per-chunk
    // slices below are row-slot reads, not re-tokenizations
    val toks = df
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .filter(org.apache.spark.sql.functions.size(col("__toks")) > 0)
    // last chunk index: chunk k covers tokens [k·step, k·step+size); it
    // adds new tokens iff k·step+size exceeds the previous chunk's end,
    // i.e. while k ≤ (ntok − overlap − 1)/step — clamped for docs shorter
    // than the overlap. Double division is exact (operands ≪ 2^53).
    val lastIx = floor(
      greatest(org.apache.spark.sql.functions.size(col("__toks"))
        - overlap - 1, lit(0)) / lit(step)).cast("int")
    toks
      .select(col("id"), posexplode(transform(sequence(lit(0), lastIx),
        k => slice(col("__toks"), k * step + 1, lit(size)))))
      .select(col("id"), col("pos").as("chunk_ix"),
        array_join(col("col"), " ").as("chunk_text"),
        org.apache.spark.sql.functions.size(col("col")).as("n_tokens"))
  }

  /** Block-level boilerplate removal — the CCNet/C4 "drop repeated
    * paragraphs" rule for corpora without line structure: tile each
    * document into NON-overlapping `blockSize`-token blocks
    * ([[chunkDocuments]] with overlap 0), drop every block whose exact
    * text occurs in at least `minDf` distinct documents, and reassemble
    * the survivors in order. Documents left with no blocks (pure
    * boilerplate) drop entirely. Output: (id, text).
    *
    * Known trade vs shingle dedup, deliberate: block tiling is
    * OFFSET-SENSITIVE (the same boilerplate at a different token offset
    * hashes into different blocks), which is what makes it one
    * aggregation instead of an all-pairs problem — near-dup detection
    * stays the sketch operators' job; this removes the exact repeated
    * template mass cheaply. Two shuffles total: the block-text groupBy
    * for document frequencies (partial-agg'd; hot blocks are by
    * definition few, the anti-join build side stays small) and the
    * per-doc reassembly groupBy. */
  def dropRepeatedBlocks(docs: DataFrame, idCol: String, textCol: String,
                         blockSize: Int, minDf: Int): DataFrame = {
    require(minDf >= 2, s"minDf < 2 would drop every block, got $minDf")
    val blocks = chunkDocuments(docs, idCol, textCol, blockSize, overlap = 0)
    val hot = blocks.groupBy("chunk_text")
      .agg(count_distinct(col("id")).as("__df"))
      .filter(col("__df") >= minDf)
      .select("chunk_text")
    blocks.join(hot, Seq("chunk_text"), "left_anti")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("chunk_ix"), col("chunk_text"))))
        .as("__bs"))
      .select(col("id"),
        array_join(transform(col("__bs"), b => b("chunk_text")), " ")
          .as("text"))
  }

  /** Block-level KEEP-FIRST dedup — the Dolma/RefinedWeb exact-paragraph
    * rule, complementing [[dropRepeatedBlocks]]: where that drops every
    * copy of a frequent block (boilerplate removal), this keeps the
    * FIRST occurrence in global (id, block_ix) order and drops only the
    * later repeats — duplicated content survives exactly once in the
    * corpus. Documents reduced to zero blocks drop entirely. Output:
    * (id, text).
    *
    * One wide exchange: blocks shuffle by a 2×xxhash64 128-bit key (16
    * bytes + ids through the wire, not the block text — same collision
    * arithmetic as [[Dedup.exact]]), first-occurrence selection is a
    * row_number in that same sort, and only surviving blocks carry text
    * into the per-doc reassembly groupBy. */
  def dedupBlocksKeepFirst(docs: DataFrame, idCol: String, textCol: String,
                           blockSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val blocks = chunkDocuments(docs, idCol, textCol, blockSize, overlap = 0)
      .withColumn("__h1", xxhash64(col("chunk_text")))
      .withColumn("__h2", xxhash64(lit(0x9e3779b9L), col("chunk_text")))
    val w = Window.partitionBy(col("__h1"), col("__h2"))
      .orderBy(col("id"), col("chunk_ix"))
    blocks.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("chunk_ix"), col("chunk_text"))))
        .as("__bs"))
      .select(col("id"),
        array_join(transform(col("__bs"), b => b("chunk_text")), " ")
          .as("text"))
  }

  /** Concat-then-chunk sequence packing: lay all documents end-to-end in
    * salted-hash order (deterministic — the same order
    * [[Sampling.tokenBudgetSample]] uses) and cut the token stream into
    * training sequences of exactly `seqLen` tokens. Each document is
    * assigned the sequence its FIRST token lands in plus its offset
    * there; a document longer than the remaining room spills into the
    * following sequence(s) — the standard packing that wastes no pad
    * tokens. Output: input columns + (seq_id, seq_offset).
    *
    * Assignment is a pure function of (ids, salt, seqLen): replay-stable,
    * and — because the global running total is the two-phase prefix sum
    * over coarse hash buckets — there is no single-partition window
    * anywhere. */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
                    seqLen: Long, salt: String = "",
                    buckets: Int = 64): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val withH = df.withColumn("__h",
      Sampling.hashBucket(col(idCol), 1000000007, salt))
    val bucket = floor(col("__h") * buckets / lit(1000000007L))
    val summed = Relational.prefixSum(withH, bucket,
      Seq(col("__h"), col(idCol)), col(tokensCol).cast("long"), "__cum")
    val before = col("__cum") - col(tokensCol).cast("long")
    // exact integer split of the running total: offset via pmod, then the
    // quotient's division is exact (numerator is a multiple of seqLen)
    val offset = pmod(before, lit(seqLen))
    summed
      .withColumn("seq_id", ((before - offset) / lit(seqLen)).cast("long"))
      .withColumn("seq_offset", offset)
      .drop("__h", "__cum")
  }
}
