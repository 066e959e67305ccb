package graft.tools
import org.apache.spark.sql.{SparkSession, functions => F}

/** Scratch micro-bench of the bucketed-append path: times
  * Warehouse.appendBucketed of a small signature-shaped frame as-is vs
  * pre-repartitioned onto the bucket key, and counts the files written. */
object WriteExperiment {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id * 2)").collect()
    import spark.implicits._
    def freshDf = spark.range(20000)
      .select(F.col("id"), F.pmod(F.xxhash64(F.col("id")), F.lit(97)).as("band"),
        F.conv(F.xxhash64(F.col("id"), F.lit(1)).cast("string"), 10, 16).as("bucket"))
      .repartition(32).localCheckpoint(true)
    def countFiles(dir: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.map(walk).sum
        else if (!f.getName.startsWith("_") && !f.getName.startsWith(".")) 1
        else 0
      walk(new java.io.File(dir))
    }
    for (mode <- Seq("asis", "repart", "repart32"); rep <- 1 to 3) {
      val root = java.nio.file.Files.createTempDirectory(s"graft_we_").toString
      val wh = new graft.sources.Warehouse(spark, root)
      val df = freshDf
      val in = mode match {
        case "repart"   => df.repartition(8, F.col("band"), F.col("bucket"))
        case "repart32" => df.repartition(32, F.col("band"), F.col("bucket"))
        case _          => df
      }
      val t0 = System.nanoTime()
      wh.appendBucketed("t1", in, Seq("band", "bucket"), 8)
      val t1 = System.nanoTime()
      println(f"[$mode rep $rep] append ${(t1 - t0) / 1e9}%.3f s, " +
        s"files=${countFiles(s"$root/warehouse/t1")}")
      // read-back join cost (the store's candidate-join read path)
      val t2 = System.nanoTime()
      val n = wh.readBucketed("t1").groupBy("band", "bucket").count()
        .filter(F.col("count") > 1).count()
      println(f"[$mode rep $rep] read-agg ${(System.nanoTime() - t2) / 1e9}%.3f s ($n)")
    }
    spark.stop()
  }
}
