package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the dedup/similarity family: runs the pair pipelines
  * against an arbitrary documents parquet (e.g. a 10× replica) and
  * prints wall time + result counts, so bucket-cap and pair-volume
  * behavior is measured, not guessed, before the next scale-up.
  *
  * Usage: runMain graft.tools.ScaleProbe /tmp/docs50k.parquet
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val docsPath = args.headOption.getOrElse("/tmp/docs50k.parquet")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()
    val docs = spark.read.parquet(docsPath)
    println(s"[probe] docs = ${docs.count()}")

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }

    time("exact_dedup") {
      graft.operators.Dedup.exact(docs, "doc_id", "text")
    }
    time("minhash_pairs") {
      graft.operators.Dedup.minhashPortablePairs(docs, "doc_id", "text",
        shingleN = 3, bands = 8, rowsPerBand = 2, threshold = 0.5, seed = 7L)
    }
    time("simhash_pairs") {
      graft.operators.Dedup.simhashPortablePairs(docs, "doc_id", "text",
        maxDist = 3, seed = 7L)
    }
    if (sys.env.contains("PROBE_JACCARD")) time("jaccard_pairs") {
      graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5, maxDocFreq = 1000)
    }

    args.lift(1).foreach { embPath =>
      val emb = spark.read.parquet(embPath)
      println(s"[probe] vectors = ${emb.count()}")
      val queries = emb.filter(col("vec_id") < 64)
      time("ivf_topk (trained)") {
        val cents = graft.operators.Similarity.centroidsDF(spark,
          graft.operators.Similarity.trainCentroids(emb, "embedding",
            kCells = 64, sampleN = 5000))
        graft.operators.Similarity.ivfTopK(emb, queries,
          "vec_id", "embedding", 10, cents, nProbes = 4)
      }
      time("lsh_topk (lattice)") {
        val planes = (0 until 4).map(t =>
          graft.functions.VectorFunctions.latticePlanes(12, 64, 42L + t))
        graft.operators.Similarity.lshTopK(emb, queries, "vec_id",
          "embedding", k = 10, dim = 64, tables = 4, bitsPerTable = 12,
          planes = Some(planes))
      }
      time("brute_topk") {
        graft.operators.Similarity.bruteForceTopK(emb, queries,
          "vec_id", "embedding", 10)
      }
    }
    spark.stop()
  }
}
