package graft.tools
import org.apache.spark.sql.{SparkSession, functions => F}
import graft.functions.TextFunctions
object TextBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.minPartitionNum", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = graft.core.Tables.documents(spark, "/root/testdata/sf0.1")
      .localCheckpoint(true)
    def t(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      for (r <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        if (r == 2) println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    val toks = TextFunctions.tokens(F.col("text"))
    t("baseline")(d.select(F.length(F.col("text"))))
    t("tokens")(d.select(toks.as("t")))
    t("quality")(d.select(TextFunctions.qualityScoreFromTokens(F.col("text"), toks)))
    t("repetition")(d.select(TextFunctions.duplicateNgramFraction(toks, 2)))
    t("redact")(d.select(TextFunctions.redactPii(F.col("text"))))
    t("alpha-regex")(d.select(F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", ""))))
    val letters = (('A' to 'Z') ++ ('a' to 'z')).mkString
    t("alpha-translate")(d.select(F.length(F.col("text")) - F.length(F.translate(F.col("text"), letters, ""))))
    t("stophits")(d.select(TextFunctions.stopwordHitsFromTokens(toks, TextFunctions.stopwords("en"))))
    spark.stop()
  }
}
