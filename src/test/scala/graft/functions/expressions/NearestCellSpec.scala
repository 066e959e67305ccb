package graft.functions.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables
import graft.functions.VectorFunctions
import graft.operators.Similarity

class NearestCellSpec extends SparkSpec {

  test("native argmin matches the broadcast-join min_by form exactly") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Similarity.centroidsDF(spark,
      Similarity.trainCentroids(e, "embedding", kCells = 16, sampleN = 500))
    // the executable spec: the old aggregation-based assignment
    val expected = e.select(col("vec_id").as("nbr_id"), col("embedding").as("cv"))
      .join(broadcast(cents))
      .groupBy(col("nbr_id"))
      .agg(min_by(col("cell"),
        struct(VectorFunctions.l2Sq(col("cv"), col("cvec")), col("cell"))).as("cell"))
    val actual = Similarity.assignCells(e, "vec_id", "embedding", cents)
      .select("nbr_id", "cell")
    assert(actual.join(expected.withColumnRenamed("cell", "exp"), "nbr_id")
      .filter(!(col("cell") <=> col("exp"))).count() === 0)
    assert(actual.count() === e.count(), "one assignment per vector")
  }

  test("ties take the smallest cell id; bad vectors yield null") {
    import spark.implicits._
    // two IDENTICAL centroids → every vector ties → smaller cell id wins
    val cents = Similarity.centroidsDF(spark,
      Seq(3 -> Seq(0.0, 0.0), 7 -> Seq(0.0, 0.0)))
    val vecs = Seq(
      (1L, Seq(1.0f, 2.0f)),
      (2L, Seq(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val out = Similarity.assignCells(vecs, "vec_id", "embedding", cents)
      .select("nbr_id", "cell").as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 3, 2L -> 3))
    // dimension mismatch → null cell
    val bad = Seq((9L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val cell = Similarity.assignCells(bad, "vec_id", "embedding", cents)
      .select("cell").head()
    assert(cell.isNullAt(0))
  }
}
