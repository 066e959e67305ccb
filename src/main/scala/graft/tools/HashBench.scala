package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object HashBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.GraftFunctions.register(spark)
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.1").cache()
    docs.count()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    for (_ <- 1 to 2) {
      time("composed HOF fingerprint") {
        docs.select(graft.functions.TextFunctions.fingerprint(col("text")).as("h"))
          .write.format("noop").mode("overwrite").save()
      }
      time("native PolyHash expression") {
        docs.select(expr("graft_poly_hash(text)").as("h"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
