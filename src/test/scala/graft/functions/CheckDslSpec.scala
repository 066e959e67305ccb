package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Mirrors the coercion matrix of /root/reference/utilities/parsing.py:23-55:
  * int, float, bool (any case), null/none, _empty, bare string, single-token
  * boolean passthrough, SyntaxError on malformed. */
class CheckDslSpec extends SparkSpec {
  import spark.implicits._

  private def eval(template: String, rows: Seq[(String, java.lang.Double)]): Seq[Boolean] = {
    val df = rows.toDF("name", "value")
    df.select(CheckDsl.compile(template).as("ok")).collect().map(_.getBoolean(0)).toSeq
  }

  test("integer literal comparison") {
    assert(eval("{value} >= 10", Seq(("a", 10.0), ("b", 9.0))) === Seq(true, false))
  }

  test("float literal comparison") {
    assert(eval("{value} < 9.5", Seq(("a", 9.4), ("b", 9.6))) === Seq(true, false))
  }

  test("all six operators") {
    val rows = Seq[(String, java.lang.Double)](("a", Double.box(5.0)))
    assert(eval("{value} == 5", rows) === Seq(true))
    assert(eval("{value} != 5", rows) === Seq(false))
    assert(eval("{value} > 4", rows) === Seq(true))
    assert(eval("{value} < 4", rows) === Seq(false))
    assert(eval("{value} >= 5", rows) === Seq(true))
    assert(eval("{value} <= 4", rows) === Seq(false))
  }

  test("bool literal any case") {
    val df = Seq((true), (false)).toDF("flag")
    val r = df.select(CheckDsl.compile("{flag} == TRUE").as("ok"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(r === Seq(true, false))
  }

  test("string literal comparison") {
    val df = Seq(("error"), ("ok")).toDF("kind")
    val r = df.select(CheckDsl.compile("{kind} == error").as("ok"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(r === Seq(true, false))
  }

  test("_empty coerces to empty string") {
    val df = Seq((""), ("x")).toDF("s")
    val r = df.select(CheckDsl.compile("{s} == _empty").as("ok"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(r === Seq(true, false))
  }

  test("null comparison is null-safe (Python None == None)") {
    val df = Seq[(String, java.lang.Double)](("a", null), ("b", 1.0)).toDF("name", "value")
    val eq = df.select(CheckDsl.compile("{value} == null").as("ok"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(eq === Seq(true, false), "{value} == null must be TRUE for null rows")
    val ne = df.select(CheckDsl.compile("{value} != none").as("ok"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(ne === Seq(false, true))
  }

  test("comparing value to null literal is false, not null") {
    val df = Seq(("a", 1.0)).toDF("name", "value")
    val r = df.select(CheckDsl.compile("{value} == null").as("ok")).collect()
    assert(!r.head.isNullAt(0), "null-safe compare never yields NULL")
    assert(!r.head.getBoolean(0))
  }

  test("single boolean token passes through") {
    val df = Seq((true), (false)).toDF("flag")
    val r = df.select(CheckDsl.compile("{flag}").as("ok"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(r === Seq(true, false))
  }

  test("malformed expression throws") {
    intercept[IllegalArgumentException] { CheckDsl.compile("{a} >= 1 extra") }
    intercept[IllegalArgumentException] { CheckDsl.compile("") }
  }

  test("property: compiled DSL matches a direct Scala evaluator (500 cases)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // the reference formats the row value into the template and evaluates
    // with Python semantics; this evaluator is the spec (None==None true,
    // None vs anything else false, ordered ops false on null)
    def evalDirect(v: Option[Long], op: String, lr: Option[Long]): Boolean =
      (op, v, lr) match {
        case ("==", a, b) => a == b
        case ("!=", a, b) => a != b
        case (_, None, _) | (_, _, None) => false
        case (">", Some(a), Some(b)) => a > b
        case ("<", Some(a), Some(b)) => a < b
        case (">=", Some(a), Some(b)) => a >= b
        case ("<=", Some(a), Some(b)) => a <= b
      }
    val genCase = for {
      v <- Gen.option(Gen.choose(-5L, 5L))
      op <- Gen.oneOf("==", "!=", ">", "<", ">=", "<=")
      litV <- Gen.option(Gen.choose(-5L, 5L))
    } yield (v, op, litV)
    val cases = Gen.listOfN(500, genCase)
      .apply(Gen.Parameters.default, Seed(42L)).get
    val df = cases.zipWithIndex
      .map { case ((v, _, _), i) => (i.toLong, v) }
      .toDF("i", "value")
    val results = cases.zipWithIndex.map { case ((_, op, lv), i) =>
      val template = s"{value} $op ${lv.map(_.toString).getOrElse("null")}"
      (i, CheckDsl.compile(template))
    }
    // evaluate all 500 compiled predicates in one pass
    val got = df.select(col("i") +: results.map { case (i, c) =>
        coalesce(c, lit(false)).as(s"c$i") }: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    cases.zipWithIndex.foreach { case ((v, op, lv), i) =>
      val want = evalDirect(v, op, lv)
      val gotV = got(i.toLong).getAs[Boolean](s"c$i")
      assert(gotV === want, s"case $i: {${v.orNull}} $op ${lv.orNull}")
    }
  }

  test("regexTemplate substitutes capture groups with fallback") {
    val df = Seq(("Customer#0042"), ("garbage")).toDF("name")
    val r = df.select(CheckDsl.regexTemplate(col("name"),
        "^Customer#(\\d+)$", "id-$1", Some("none")).as("t"))
      .collect().map(_.getString(0)).toSeq
    assert(r === Seq("id-0042", "none"))
  }

  test("regexTemplate with multiple groups and no fallback keeps input") {
    val df = Seq(("ab-cd"), ("nope")).toDF("s")
    val r = df.select(CheckDsl.regexTemplate(col("s"),
        "^(\\w+)-(\\w+)$", "$2/$1").as("t"))
      .collect().map(_.getString(0)).toSeq
    assert(r === Seq("cd/ab", "nope"))
  }
}
