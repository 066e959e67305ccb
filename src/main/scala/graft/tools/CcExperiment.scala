package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B harness for connected-components scheduling experiments:
  * builds q96's real pair set at the given SF, then times CC variants and
  * checks their labelings agree. Not part of any query path. */
object CcExperiment {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()
    val planes = (0 until 4).map(t =>
      graft.functions.VectorFunctions.latticePlanes(4, 64, 770L + t))
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val pairs = graft.operators.Similarity.lshNearDupPairs(
      emb, "vec_id", "embedding", threshold = 0.35, dim = 64,
      tables = 4, bitsPerTable = 4, planes = Some(planes))
      .select("id_a", "id_b").localCheckpoint(true)
    println(s"pairs: ${pairs.count()}")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // current implementation, twice (warm)
    var base: DataFrame = null
    for (r <- 1 to 3) base = time(s"current r$r") {
      graft.operators.Dedup.connectedComponents(pairs, "id_a", "id_b")
        .localCheckpoint(true)
    }
    println(s"base labels: ${base.count()}")
    spark.stop()
  }
}
