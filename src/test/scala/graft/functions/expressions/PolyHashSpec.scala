package graft.functions.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables
import graft.functions.TextFunctions

class PolyHashSpec extends SparkSpec {
  import spark.implicits._

  test("native expression matches the composed column program exactly") {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val mismatches = docs
      .select(TextFunctions.fingerprintComposed(col("text")).as("composed"),
        expr("graft_poly_hash(text)").as("native"))
      .filter(col("composed") =!= col("native"))
      .count()
    assert(mismatches === 0)
  }

  test("scala reference, empty string, unicode codepoints") {
    GraftFunctions.register(spark)
    val vals = Seq("", "a", "hello world", "café 😀")
    val got = vals.toDF("s").select(expr("graft_poly_hash(s)")).as[Long]
      .collect().toSeq
    val want = vals.map(PolyHash.hash)
    assert(got === want)
    // direct fold over codepoints as the independent reference
    assert(PolyHash.hash("ab") === (('a'.toLong * 31 + 'b') % 1000000007L))
  }

  test("native simhash matches the composed column program exactly") {
    val coeffs = graft.operators.Dedup.universalCoeffs(32, 7L)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        transform(TextFunctions.tokens(col("text")),
          t => graft.operators.Dedup.polyHash(t)).as("hv"))
      .filter(size(col("hv")) > 0)
    val mismatches = docs.select(
        graft.operators.Dedup.simhashFromHashes(col("hv"), coeffs).as("native"),
        graft.operators.Dedup.simhashFromHashesComposed(col("hv"), coeffs).as("composed"))
      .filter(col("native") =!= col("composed"))
      .count()
    assert(mismatches === 0)
  }

  test("native minhash minima match the composed column program exactly") {
    val coeffs = graft.operators.Dedup.universalCoeffs(16, 7L)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        transform(TextFunctions.wordShingles(col("text"), 3),
          s => graft.operators.Dedup.polyHash(s)).as("hv"))
      .filter(size(col("hv")) > 0)
    val native = ColumnBridge.column(PortableMinHash(
      ColumnBridge.expression(col("hv")),
      coeffs.map(_._1).toArray, coeffs.map(_._2).toArray))
    val composed = array(coeffs.map { case (a, b) =>
      array_min(transform(col("hv"),
        x => pmod(lit(a) * x + lit(b), lit(1000000007L))))
    }: _*)
    val mismatches = docs.select(native.as("n"), composed.as("c"))
      .filter(col("n") =!= col("c")).count()
    assert(mismatches === 0)
  }

  test("usable from the S9 spark.sql surface") {
    GraftFunctions.register(spark)
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    val n = spark.sql(
      "SELECT doc_id, graft_poly_hash(text) AS h FROM documents WHERE doc_id < 5")
      .count()
    assert(n === 5)
  }
}
