package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for the training-data pipeline tier.
  *
  * Design rule shared by all near-dup variants: NEVER materialize the
  * full O(n²) pair space. Candidate generation goes through an equi-join
  * key (shingle, band hash, bucket) so Spark executes it as a shuffled
  * hash join over a skew-bounded key; verification then runs only on
  * candidate pairs. That is what survives a 100× scale-up — a cross join
  * does not.
  */
object Dedup {

  /** Exact dedup: keep the first row (min id) per identical value.
    * One shuffle on the (hashed) value. `xxhash64` pre-hash keeps wide
    * text out of the shuffle — 8 bytes per row instead of the document. */
  def exact(df: DataFrame, idCol: String, valueCol: String): DataFrame = {
    val hashed = df.withColumn("__h", xxhash64(col(valueCol)))
    val keep = hashed.groupBy(col("__h")).agg(min(col(idCol)).as(idCol))
    hashed.join(keep, Seq("__h", idCol)).drop("__h")
  }

  /** Exact-dup groups: value hash → sorted member ids + count (>1 only). */
  def exactGroups(df: DataFrame, idCol: String, valueCol: String): DataFrame =
    df.groupBy(col(valueCol))
      .agg(count(lit(1)).as("dup_count"),
           array_sort(collect_list(col(idCol))).as("members"))
      .filter(col("dup_count") > 1)

  /** N-gram Jaccard near-dup pairs, exact (the oracle for the sketch
    * variants): explode word shingles → self-equi-join on shingle →
    * per-pair intersection count → Jaccard = |∩| / (|A|+|B|-|∩|).
    *
    * Scale: the join key is a shingle, so cost is Σ(docs per shingle)²
    * — bounded by dropping ubiquitous shingles (`maxDocFreq`), the
    * standard stop-shingle trick. No cross join anywhere.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double,
                        maxDocFreq: Long = 1000000L): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        explode(TextFunctions.wordShingles(col(textCol), n)).as("shingle"))
    val filtered = {
      val freq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDocFreq && col("df") >= 2)
      sh.join(freq, Seq("shingle")).select("id", "shingle")
    }
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val pairs = filtered.as("a")
      .join(filtered.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(sizes.withColumnsRenamed(Map("id" -> "id_a", "sz" -> "sz_a")), "id_a")
      .join(sizes.withColumnsRenamed(Map("id" -> "id_b", "sz" -> "sz_b")), "id_b")
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("sz_a") + col("sz_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signature: per row, for each of `numHashes` seeded hash
    * functions take the min over the shingle set. Pure column program —
    * `transform` over a seeded xxhash64 of each shingle, `array_min`.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shingles,
        s => xxhash64(lit(seed), s)))
    }: _*)

  /** MinHash + LSH banding near-dup candidates: signature of
    * `bands*rowsPerBand` minhashes, hashed per band; docs sharing any
    * band bucket become candidate pairs, then exact Jaccard verifies.
    *
    * Scale: candidate generation is an equi-join on (band, bucketHash) —
    * tunable via bands/rows for the target threshold; verification cost
    * is proportional to candidates, not n².
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      shingleN: Int, bands: Int, rowsPerBand: Int,
                      threshold: Double): DataFrame = {
    val numHashes = bands * rowsPerBand
    val withSig = df.select(
      col(idCol).as("id"), col(textCol).as("__text"),
      minhashSignature(TextFunctions.wordShingles(col(textCol), shingleN),
        numHashes).as("sig"))
    val banded = withSig.select(col("id"), col("__text"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)
            .cast("array<string>").cast("string")).as("bucket"))
      }: _*)).as("bb"))
      .select(col("id"), col("__text"), col("bb.band"), col("bb.bucket"))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.__text").as("text_a"), col("b.__text").as("text_b"))
      .dropDuplicates("id_a", "id_b")
    // verify with exact Jaccard over the shingle sets of the pair
    val ja = exactJaccard(col("text_a"), col("text_b"), shingleN)
    candidates.withColumn("jaccard", ja)
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Exact Jaccard of two texts' shingle sets, as a column program. */
  def exactJaccard(a: Column, b: Column, n: Int): Column = {
    val sa = TextFunctions.wordShingles(a, n)
    val sb = TextFunctions.wordShingles(b, n)
    val inter = size(array_intersect(sa, sb)).cast("double")
    val uni = size(array_union(sa, sb)).cast("double")
    when(uni === 0.0, lit(0.0)).otherwise(inter / uni)
  }

  /** 64-bit SimHash over word tokens: per bit, sum +1/-1 weighted by the
    * token-hash bit, sign → bit. Near-dups = signatures within small
    * Hamming distance; bucketing on bit-chunks gives the candidate join.
    */
  def simhash(text: Column): Column = {
    val tokenHashes = transform(TextFunctions.tokens(text), t => xxhash64(t))
    (0 until 64).map { bit =>
      val bitSum = aggregate(tokenHashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L) * lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** SimHash near-dup candidate pairs within Hamming distance `maxDist`,
    * using the pigeonhole 4×16-bit chunk trick: pairs within distance ≤3
    * must share at least one exact 16-bit chunk → equi-join on
    * (chunkIdx, chunkValue), verify with bit_count(xor). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame = {
    val withSig = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val chunked = withSig.select(col("id"), col("sig"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("sig"), c * 16).bitwiseAND(0xFFFFL).as("cval"))
      }: _*)).as("cc"))
      .select(col("id"), col("sig"), col("cc.chunk"), col("cc.cval"))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cval") === col("b.cval") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxDist)
  }
}
