package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, input: String): T =
    Seq(input).toDF("text").select(c.as("r")).collect().head.getAs[T]("r")

  test("wordCount matches reference semantics (len>1 + has letter)") {
    // "a" too short, "42" no letter, "b2" counts
    assert(one[Int](TextFunctions.wordCount(col("text")), "a 42 b2 hello x") === 2)
  }

  test("tokenCount drops empty tokens") {
    assert(one[Int](TextFunctions.tokenCount(col("text")), "  a   b  ") === 2)
    assert(one[Int](TextFunctions.tokenCount(col("text")), "") === 0)
  }

  test("subwordCount splits letters/digits/symbols") {
    // "abc123!x" → abc, 123, !, x = 4 ; space not counted
    assert(one[Int](TextFunctions.subwordCount(col("text")), "abc123!x y") === 5)
  }

  test("langId picks dominant stopword language") {
    assert(one[String](TextFunctions.langId(col("text")),
      "the cat and the dog is in it") === "en")
    assert(one[String](TextFunctions.langId(col("text")),
      "der hund und die katze ist nicht da") === "de")
    assert(one[String](TextFunctions.langId(col("text")),
      "zzz qqq www") === "und")
  }

  test("langId tie breaks to first language alphabetically") {
    // "la" is in both es and fr lists → tie at 1 → "es" < "fr"
    assert(one[String](TextFunctions.langId(col("text")), "la maison") === "es")
    // "de" (es) vs "der" (de): craft exact tie: one hit each
    assert(one[String](TextFunctions.langId(col("text")), "der de") === "de")
  }

  test("duplicateNgramFraction: empty/short 0.0, loops score high") {
    def rep(n: Int, text: String): Double =
      one[Double](TextFunctions.duplicateNgramFraction(
        TextFunctions.tokens(col("text")), n), text)
    assert(rep(2, "") === 0.0, "empty doc")
    assert(rep(2, "one") === 0.0, "fewer tokens than n")
    assert(rep(2, "a b c d") === 0.0, "all bigrams unique")
    // "a b a b a b": bigrams [a b, b a, a b, b a, a b] → 5 total, 2 distinct
    assert(rep(2, "a b a b a b") === 3.0 / 5.0, "looping text scores high")
    assert(rep(3, "x y z x y z") === 1.0 / 4.0)
  }

  test("redactPii: emails, phones, IPs replaced by typed placeholders") {
    def red(s: String): String =
      one[String](TextFunctions.redactPii(col("text")), s)
    assert(red("mail a.b+c@ex-ample.co.uk now") === "mail <EMAIL> now")
    assert(red("call +49 (30) 1234-5678 today") === "call <PHONE> today")
    assert(red("host 10.0.0.1 up") === "host <IP> up")
    assert(red("x@y.de or 192.168.0.255 or 0123456789") ===
      "<EMAIL> or <IP> or <PHONE>")
    assert(red("nothing here") === "nothing here")
    assert(red("v1.2.3 release") === "v1.2.3 release",
      "short dotted versions are not IPs (needs 4 octets)")
    // digit-counting keeps common numerics out of the phone pattern
    assert(red("on 2024-01-01 we hired 1000-2000 people") ===
      "on 2024-01-01 we hired 1000-2000 people",
      "dates and numeric ranges (8 digits) are not phones (needs 9+)")
    assert(red("serial 123 456 789 0") === "serial <PHONE>",
      "10 spaced digits still redact")
  }

  test("wordShingles: empty → [], short → whole text, normal → n-grams") {
    assert(one[Seq[String]](TextFunctions.wordShingles(col("text"), 3), "") === Seq())
    assert(one[Seq[String]](TextFunctions.wordShingles(col("text"), 3), "one two")
      === Seq("one two"))
    assert(one[Seq[String]](TextFunctions.wordShingles(col("text"), 2), "a b c").sorted
      === Seq("a b", "b c"))
  }

  test("wordShingles dedups repeated shingles") {
    assert(one[Seq[String]](TextFunctions.wordShingles(col("text"), 2), "x y x y")
      .sorted === Seq("x y", "y x"))
  }

  test("wordShingles native kernel matches the composed chain verbatim") {
    // the spec that licenses the WordShingles codegen expression: same
    // values, same first-occurrence order, same edge semantics as the
    // composed array_distinct(when/transform/array_join(slice)) form
    import org.apache.spark.sql.functions._
    def composed(toks: org.apache.spark.sql.Column, n: Int) = {
      val idx = sequence(lit(0), greatest(size(toks) - n, lit(0)))
      array_distinct(
        when(size(toks) === 0, array().cast("array<string>"))
          .when(size(toks) >= n,
            transform(idx, i =>
              array_join(slice(toks, i + lit(1), lit(n)), " ")))
          .otherwise(array(array_join(toks, " "))))
    }
    val texts = Seq("", "one", "one two", "a b c d e", "x y x y x",
      "the the the", "w1 w2 w3 w1 w2 w3 w1", "solo")
    for (n <- Seq(1, 2, 3, 5)) {
      val df = texts.toDF("text")
        .select(TextFunctions.tokens(col("text")).as("__toks"))
      val native = df
        .select(TextFunctions.wordShinglesFromTokens(col("__toks"), n))
        .collect().map(_.getSeq[String](0)).toSeq
      val old = df.select(composed(col("__toks"), n))
        .collect().map(_.getSeq[String](0)).toSeq
      assert(native === old, s"n=$n")
    }
  }

  test("fingerprint matches a direct Scala fold (portable arithmetic)") {
    val texts = Seq("hello world", "a", "", "Spark SQL 4.1")
    val df = texts.toDF("text")
    val got = df.select(TextFunctions.fingerprint(col("text")).as("fp"))
      .collect().map(_.getLong(0)).toSeq
    val want = texts.map(t =>
      t.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % 1000000007L))
    assert(got === want)
  }

  test("stripHtml removes block tags and collapses whitespace") {
    val html = "<body><script>var x;</script><p>Hello   <b>world</b></p></body>"
    assert(one[String](TextFunctions.stripHtml(col("text")), html) === "Hello world")
  }

  test("mainContent keeps the article, drops nav/sidebar/footer chrome") {
    val article = "This is the actual article text of the page and it " +
      "carries the substance a reader came for, well past the length gate."
    val html = "<html><body>" +
      "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>" +
      "<div class='side'><ul><li><a href='/t1'>Tag one</a></li>" +
      "<li><a href='/t2'>Tag two</a></li></ul></div>" +
      s"<article><p>$article</p><p>See <a href='/ref'>the reference</a> " +
      "for details on the method and its guarantees here.</p></article>" +
      "<footer><a href='/imprint'>Imprint</a> legal</footer></body></html>"
    val got = one[String](TextFunctions.mainContent(col("text")), html)
    // chrome gone, both article blocks kept (the second has ONE link in
    // prose — under the density gate), single-space joined
    assert(got === article + " See the reference for details on the " +
      "method and its guarantees here.")
    // an all-link block of any length dies by density, not just length
    val linkFarm = "<div>" + (1 to 20).map(i =>
      s"<a href='/$i'>related article number $i</a>").mkString(" ") + "</div>"
    assert(one[String](TextFunctions.mainContent(col("text")), linkFarm) === "")
    // degenerate inputs survive
    assert(one[String](TextFunctions.mainContent(col("text")), "") === "")
    assert(one[String](TextFunctions.mainContent(col("text")),
      "no tags at all but a perfectly fine plain sentence") ===
      "no tags at all but a perfectly fine plain sentence")
  }

  test("qualityScore is bounded and monotone-ish in quality") {
    val junk = one[Double](TextFunctions.qualityScore(col("text")), "@@@ ### !!!")
    val good = one[Double](TextFunctions.qualityScore(col("text")),
      "the quick brown fox jumps over the lazy dog and it is a fine day " * 10)
    assert(junk >= 0.0 && junk <= 1.0)
    assert(good >= 0.0 && good <= 1.0)
    assert(good > junk)
  }

  test("gopherRules: each published rule trips on its own pathology " +
      "and a clean doc passes the battery") {
    def rules(input: String, minWords: Int = 5) =
      Seq(input).toDF("text")
        .select(TextFunctions.gopherRules(col("text"),
          TextFunctions.tokens(col("text")), minWords = minWords).as("g"))
        .select(col("g.*")).collect().head
    def b(r: org.apache.spark.sql.Row, f: String): Boolean =
      r.getBoolean(r.fieldIndex(f))
    val clean = rules("the quick brown fox jumps over that lazy dog " +
      "and we have fun with it all day long here")
    assert(b(clean, "pass"), s"clean prose must pass: $clean")
    // 1. word count below the floor
    assert(!b(rules("the cat and that dog", minWords = 6), "r_words"))
    // 2. mean word length outside [3, 10]
    assert(!b(rules("a b c d e f g h"), "r_mean_len"))
    assert(!b(rules("extraordinarily incomprehensibilities " +
      "antidisestablishmentarianism counterrevolutionaries " +
      "uncharacteristically"), "r_mean_len"))
    // 3. symbol ratios: '#' per word and '...' per word
    assert(!b(rules("the # tag # stream # of # hash # marks # here"),
      "r_symbol"))
    assert(!b(rules("truncated... snippets... everywhere... today... " +
      "again... more..."), "r_symbol"))
    // 4. >90% bullet lines (each non-blank line starts with a bullet)
    val bullets = (1 to 12).map(i => s"• item $i").mkString("\n")
    assert(!b(rules(bullets), "r_bullet"))
    // 5. >30% of lines end with an ellipsis (both spellings)
    assert(!b(rules("teaser one...\nteaser two…\nplain line"),
      "r_ell_line"))
    // 6. <80% of words contain a letter
    assert(!b(rules("111 222 333 444 the 555 666 777 888 999"),
      "r_alpha"))
    // 7. fewer than 2 distinct stop-set hits
    assert(!b(rules("quark boson lepton hadron photon gluon meson"),
      "r_stop"))
    // null text = the empty doc: zero words, count-gated rules fail,
    // pass is FALSE (never null)
    val nullRow = Seq(Option.empty[String]).toDF("text")
      .select(TextFunctions.gopherRules(col("text"),
        TextFunctions.tokens(col("text"))).as("g"))
      .select(col("g.*")).collect().head
    assert(!nullRow.isNullAt(nullRow.fieldIndex("pass")) &&
      !b(nullRow, "pass") && nullRow.getLong(0) === 0L)
  }

  test("gopherRules plugs into curate as the quality stage") {
    import graft.operators.Pipeline
    val docs = Seq(
      (1L, "the quick brown fox jumps over that lazy dog and we " +
        "have fun with it all day long here in the sun"),
      (2L, "spam spam spam"), // fails the word-count floor
      (3L, "111 222 333 444 the 555 666 777 888 999 000 111 222 " +
        "333 444 555 666 777 888 999")) // fails the alpha rule
      .toDF("doc_id", "text")
    val r = Pipeline.curate(docs, "doc_id", "text",
      cfg = Pipeline.CurateConfig(
        minQuality = 0.5, maxRepetition = 1.0,
        qualityExpr = Some((t, tk) =>
          when(TextFunctions.gopherRules(t, tk, minWords = 10)
            .getField("pass"), lit(1.0)).otherwise(lit(0.0)))),
      withAudit = true)
    assert(r.kept.select("id").collect().map(_.getLong(0)).toSet ===
      Set(1L))
    val dropped = r.audit.get.filter(col("stage") === "quality")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(dropped === Set(2L, 3L))
  }
}
