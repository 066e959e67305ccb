package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the Jinja-subset template engine — semantics pinned to
  * what the reference's alerting templates exercise
  * (email_alert.txt/.html + the datetime filter of
  * template_renderer.py:12). */
class TemplatesSpec extends AnyFunSuite {

  private val ts = java.sql.Timestamp.valueOf("2024-05-01 08:30:00")

  test("output: dotted paths, missing renders empty, literal text kept") {
    val out = Templates.render(
      "a={{ x }} b={{ m.k }} c={{ missing }} d={{ m.nope.deep }}!",
      Map("x" -> 1L, "m" -> Map("k" -> "v")))
    assert(out === "a=1 b=v c= d=!")
  }

  test("filters: e escapes in markupsafe order, datetime formats UTC") {
    assert(Templates.render("{{ s|e }}", Map("s" -> """<a href="x">&'""")) ===
      "&lt;a href=&#34;x&#34;&gt;&amp;&#39;")
    assert(Templates.render("{{ t|datetime(\"%Y-%m-%d %H:%M:%S\") }}",
      Map("t" -> ts)) === "2024-05-01 08:30:00")
    // default format carries the +0000 offset (rendered in UTC)
    assert(Templates.render("{{ t|datetime }}", Map("t" -> ts)) ===
      "2024-05-01T08:30:00+0000")
    intercept[IllegalArgumentException] {
      Templates.render("{{ x|upper }}", Map("x" -> "a"))
    }
  }

  test("autoescape escapes each output exactly once (|e not doubled)") {
    val vars = Map[String, Any]("s" -> "a<b")
    assert(Templates.render("{{ s }}", vars, autoescape = true) === "a&lt;b")
    assert(Templates.render("{{ s|e }}", vars, autoescape = true) === "a&lt;b",
      "explicit |e under autoescape must not double-escape")
    assert(Templates.render("{{ s }}", vars) === "a<b",
      "no escaping when autoescape is off and no |e")
    assert(Templates.autoescapes("x/y.txt") && Templates.autoescapes("a.html")
      && !Templates.autoescapes("a.j2"))
  }

  test("for loop: loop.index/first/last and break") {
    val out = Templates.render(
      "{% for x in xs %}{{ loop.index }}:{{ x }}" +
        "{% if loop.first %}<{% endif %}{% if loop.last %}>{% endif %} " +
        "{% endfor %}",
      Map("xs" -> Seq("a", "b", "c")))
    assert(out === "1:a< 2:b 3:c> ")
    val broke = Templates.render(
      "{% for x in xs %}{{ x }}{% if loop.index == 2 %}!{% break %}{% endif %},{% endfor %}end",
      Map("xs" -> Seq("a", "b", "c")))
    assert(broke === "a,b!end", "break stops the loop, tail text continues")
    assert(Templates.render("{% for x in nope %}{{ x }}{% endfor %}-",
      Map.empty) === "-", "missing sequence iterates zero times")
  }

  test("if: == and != with literals and paths, truthy fallback") {
    val vars = Map[String, Any]("n" -> 2L, "s" -> "x", "empty" -> "",
      "f" -> false, "seq" -> Seq(1L))
    def r(t: String) = Templates.render(t, vars)
    assert(r("{% if n == 2 %}y{% endif %}") === "y")
    assert(r("{% if n != 2 %}y{% endif %}") === "")
    assert(r("{% if s == \"x\" %}y{% endif %}") === "y")
    assert(r("{% if s %}y{% endif %}") === "y")
    assert(r("{% if empty %}y{% endif %}") === "", "empty string is falsy")
    assert(r("{% if f %}y{% endif %}") === "")
    assert(r("{% if seq %}y{% endif %}") === "y")
    assert(r("{% if missing %}y{% endif %}") === "", "undefined is falsy")
  }

  test("parse errors: unsupported statements and unbalanced tags throw") {
    intercept[IllegalArgumentException] {
      Templates.render("{% extends \"base.html\" %}", Map.empty)
    }
    intercept[IllegalArgumentException] {
      Templates.render("{% for x in xs %}no endfor", Map("xs" -> Seq(1)))
    }
    intercept[IllegalArgumentException] {
      Templates.render("{% endif %}", Map.empty)
    }
    // break outside a loop is a PARSE error (jinja loopcontrols compile
    // error), not a render-time explosion poisoning every dispatch
    intercept[IllegalArgumentException] {
      Templates.render("{% if x %}{% break %}{% endif %}", Map("x" -> true))
    }
  }

  test("multi-line tags, comments, quoted operators") {
    assert(Templates.render("a {{\n  x\n}} b", Map("x" -> "v")) === "a v b")
    assert(Templates.render("x{# a comment\nspanning lines #}y", Map.empty)
      === "xy", "comment tags emit nothing")
    // '!=' inside a quoted literal must not split the condition
    assert(Templates.render("{% if s == \"a!=b\" %}hit{% endif %}",
      Map("s" -> "a!=b")) === "hit")
    assert(Templates.render("{% if s == \"a!=b\" %}hit{% endif %}",
      Map("s" -> "other")) === "")
    // a dashed operand is a path, not a crashing numeric literal
    assert(Templates.render("{% if x == 1-2 %}hit{% endif %}",
      Map("x" -> 1L)) === "", "non-numeric '1-2' resolves as a missing path")
  }

  test("load rejects paths escaping the templates root") {
    val root = java.nio.file.Files.createTempDirectory("tpl_jail").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "ok.txt"), "ok".getBytes("UTF-8"))
    val outside = java.nio.file.Files.createTempFile("secret", ".txt")
    java.nio.file.Files.write(outside, "secret".getBytes("UTF-8"))
    assert(Templates.load(root, "ok.txt") === "ok")
    intercept[IllegalArgumentException] {
      Templates.load(root, s"../${outside.getFileName}")
    }
    intercept[IllegalArgumentException] {
      Templates.load(root, "../../etc/passwd")
    }
  }

  test("strftime: supported directives, %%, unknown throws") {
    assert(Templates.strftime(ts, "%Y-%m-%dT%H:%M:%S%z") ===
      "2024-05-01T08:30:00+0000")
    assert(Templates.strftime(ts, "100%%") === "100%")
    intercept[IllegalArgumentException] { Templates.strftime(ts, "%Q") }
  }

  test("load: filesystem root wins, classpath fallback, missing throws") {
    val root = java.nio.file.Files.createTempDirectory("tpl").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "t.txt"), "disk".getBytes("UTF-8"))
    assert(Templates.load(root, "t.txt") === "disk")
    // stock template ships on the classpath under templates/
    assert(Templates.load(root, "alerting_dispatcher/email_alert.txt")
      .contains("{{ title }}"))
    intercept[IllegalArgumentException] { Templates.load(root, "nope.txt") }
  }

  test("stock text template matches the reference's rendered shape") {
    def alert(m: String) = Notifications.Alert(ts, m, "{}")
    val body = Templates.render(Notifications.stockText.source,
      Map("title" -> "T", "infotext" -> "I",
        "alerts" -> (1 to 3).map(i => alert(s"m$i"))),
      autoescape = true)
    assert(body ===
      "T\n\nI\n\n" +
        "2024-05-01 08:30:00 - m1\n" +
        "2024-05-01 08:30:00 - m2\n" +
        "2024-05-01 08:30:00 - m3\n")
    // 12 alerts: line 10 then ellipsis, loop broken, NO trailing newline
    val capped = Templates.render(Notifications.stockText.source,
      Map("title" -> "T", "infotext" -> "I",
        "alerts" -> (1 to 12).map(i => alert(s"m$i"))),
      autoescape = true)
    assert(capped.endsWith("m10\n...") && !capped.contains("m11"))
  }
}
