package graft.functions.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions

class NormalizeTextSpec extends SparkSpec {
  import spark.implicits._

  // every case verified against DuckDB strip_accents(lower(nfc_normalize))
  // byte-for-byte (the q91 oracle re-verifies cross-engine each round)
  private val cases = Seq(
    // composed and decomposed forms of the same word converge
    ("CafÉ", "cafe"),
    ("Café", "cafe"),
    ("NAÏVE", "naive"),
    ("naïve", "naive"),
    // ø, ß, ligatures do NOT decompose (DuckDB parity, not NFKD)
    ("Straße", "straße"),
    ("øl", "øl"),
    ("ﬁne", "ﬁne"),
    // simple-mapping lowercase: İ→i (not i+dot), final sigma stays σ
    ("İstanbul", "istanbul"),
    ("ΑΣ", "ασ"),
    // dakuten strips whether composed or combining; Hangul recomposes
    ("が", "か"),
    ("が", "か"),
    ("뷁", "뷁"),
    // Devanagari spacing matra (Mc) is stripped like DuckDB does
    ("की", "क"),
    // fullwidth chars lowercase but don't fold width (NFC, not NFKC)
    ("ＡＢ", "ａｂ"),
    ("plain ASCII 123", "plain ascii 123"))

  test("normalize: DuckDB-verified corner table, interpreted eval") {
    cases.foreach { case (in, want) =>
      val got = NormalizeText.normalize(in, stripAccents = true, lower = true)
      assert(got === want, s"input ${in.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("normalize: codegen path equals interpreted eval on the corner table") {
    val df = cases.map(_._1).toDF("s")
      .select(col("s"), TextFunctions.normalizeText(col("s")).as("n"))
    val got = df.as[(String, String)].collect().toMap
    cases.foreach { case (in, want) => assert(got(in) === want) }
  }

  test("flags: keep case, keep accents, and null passthrough") {
    val df = Seq("CafÉ naÏve", null.asInstanceOf[String])
      .toDF("s")
      .select(
        TextFunctions.normalizeText(col("s"), stripAccents = true,
          lower = false).as("keepcase"),
        TextFunctions.normalizeText(col("s"), stripAccents = false,
          lower = true).as("keepacc"))
    val rows = df.collect()
    assert(rows(0).getString(0) === "CafE naIve")
    assert(rows(0).getString(1) === "café naïve")
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }

  test("sql registration: graft_normalize_text with literal flags") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_normalize_text('CafÉ') AS a, " +
        "graft_normalize_text('CafÉ', true, false) AS b").head()
    assert(r.getString(0) === "cafe")
    assert(r.getString(1) === "CafE")
  }
}
