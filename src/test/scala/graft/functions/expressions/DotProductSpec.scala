package graft.functions.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables
import graft.functions.VectorFunctions

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("native dot is bit-equal to the composed fold on real embeddings") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pairs = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .crossJoin(e.select(col("vec_id").as("ib"), col("embedding").as("vb")))
      .limit(500)
    val mismatches = pairs.select(
        VectorFunctions.dot(col("va"), col("vb")).as("native"),
        VectorFunctions.dotComposed(col("va"), col("vb")).as("composed"))
      .filter(!(col("native") <=> col("composed")))
      .count()
    assert(mismatches === 0)
  }

  test("native l2sq is bit-equal to the composed fold on real embeddings") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pairs = e.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .crossJoin(e.select(col("vec_id").as("ib"), col("embedding").as("vb")))
      .limit(500)
    val mismatches = pairs.select(
        VectorFunctions.l2Sq(col("va"), col("vb")).as("native"),
        VectorFunctions.l2SqComposed(col("va"), col("vb")).as("composed"))
      .filter(!(col("native") <=> col("composed")))
      .count()
    assert(mismatches === 0)
  }

  test("mixed float/double arrays and null semantics match zip_with") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(0.5, 0.25))).toDF("f", "d")
    val row = df.select(
      VectorFunctions.dot(col("f"), col("d")).as("native"),
      VectorFunctions.dotComposed(col("f"), col("d")).as("composed"),
      VectorFunctions.dot(col("f"), slice(col("d"), 1, 1)).as("mismatch"))
      .head()
    assert(row.getDouble(0) === row.getDouble(1))
    assert(row.getDouble(0) === 1.0)
    assert(row.isNullAt(2), "length mismatch yields NULL, like zip_with")
  }
}
