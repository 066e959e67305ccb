package graft.plans

/** Minimal template engine for the notification templates — the subset
  * of Jinja2 the reference's alerting templates actually use
  * (resources/templates/alerting_dispatcher/email_alert.txt:1-7,
  * email_alert.html; rendered via service/template/template_renderer.py
  * with a `datetime` strftime filter and `templateVariables` from the
  * dispatcher config, alerting_dispatcher.py:120-121,132).
  *
  * Supported syntax:
  *  - `{{ path }}` and `{{ path|filter }}` output, dotted paths into
  *    maps / [[Notifications.Alert]] fields (`date`, `message`, `data`);
  *  - filters: `e` (HTML escape, markupsafe order) and
  *    `datetime("strftime-fmt")` (default `%Y-%m-%dT%H:%M:%S%z`, UTC);
  *  - `{% for x in path %} … {% endfor %}` with `loop.index` (1-based),
  *    `loop.first`, `loop.last`;
  *  - `{% if a == b %}` / `{% if a != b %}` / truthy `{% if path %}`
  *    … `{% endif %}`;
  *  - `{% break %}` inside a loop.
  *
  * Not supported (documented, throws at parse): `{% extends %}` /
  * `{% block %}` inheritance — file templates must be standalone; the
  * stock HTML template ships as a standalone equivalent. Like Jinja2
  * (keep_trailing_newline=False) one trailing newline of the template
  * file is stripped.
  */
object Templates {

  // ------------------------------------------------------------- loading

  /** Read `root/path` as UTF-8. When the file isn't on disk, fall back
    * to the classpath under `templates/<path>` — that's where the stock
    * templates ship in the jar. A path found in neither place throws
    * (the reference's Jinja FileSystemLoader raises TemplateNotFound — a
    * typo'd path must not silently fall back to a default body). */
  def load(root: String, path: String): String = {
    // containment: a config path must stay under the template root, like
    // Jinja's FileSystemLoader which raises TemplateNotFound on up-paths
    // — "../../etc/passwd" must never end up in an outgoing email body
    val rootP = java.nio.file.Paths.get(root).toAbsolutePath.normalize
    val f = rootP.resolve(path).normalize
    if (!f.startsWith(rootP))
      throw new IllegalArgumentException(s"template not found: $path " +
        "(path escapes the templates root)")
    if (java.nio.file.Files.isRegularFile(f))
      new String(java.nio.file.Files.readAllBytes(f),
        java.nio.charset.StandardCharsets.UTF_8)
    else {
      val in =
        if (path.split('/').contains("..")) null
        else getClass.getClassLoader.getResourceAsStream(s"templates/$path")
      if (in == null)
        throw new IllegalArgumentException(s"template not found: $f")
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
  }

  /** Jinja's select_autoescape over the reference renderer's
    * `file_extensions=('html', 'txt')` — BOTH text and html templates
    * autoescape (template_renderer.py:5-12). */
  def autoescapes(path: String): Boolean =
    path.endsWith(".html") || path.endsWith(".txt")

  // --------------------------------------------------------------- model

  private sealed trait Node
  private final case class Text(s: String) extends Node
  private final case class Out(path: Seq[String],
                               filters: Seq[(String, Option[String])]) extends Node
  private final case class For(varName: String, path: Seq[String],
                               body: Seq[Node]) extends Node
  private final case class If(cond: Cond, body: Seq[Node]) extends Node
  private case object Break extends Node

  private sealed trait Cond
  private final case class Cmp(a: Operand, b: Operand, eq: Boolean) extends Cond
  private final case class Truthy(path: Seq[String]) extends Cond
  private sealed trait Operand
  private final case class Lit(v: Any) extends Operand
  private final case class Path(p: Seq[String]) extends Operand

  // -------------------------------------------------------------- parser

  // (?s): tags may span lines (editors wrap long expressions — Jinja
  // allows it); {# … #} comments are recognized and dropped
  private val Tag = raw"(?s)\{\{.*?\}\}|\{%.*?%\}|\{#.*?#\}".r

  private def parse(src: String): Seq[Node] = {
    // one trailing newline stripped, as Jinja does by default
    val s = if (src.endsWith("\r\n")) src.dropRight(2)
            else if (src.endsWith("\n")) src.dropRight(1) else src
    val (nodes, rest) = parseUntil(tokenize(s), Set.empty, inLoop = false)
    require(rest.isEmpty, "unbalanced template tags")
    nodes
  }

  private sealed trait Tok
  private final case class Raw(s: String) extends Tok
  private final case class Expr(s: String) extends Tok
  private final case class Stmt(s: String) extends Tok

  private def tokenize(s: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var last = 0
    for (m <- Tag.findAllMatchIn(s)) {
      if (m.start > last) out += Raw(s.substring(last, m.start))
      val t = m.matched
      if (t.startsWith("{{")) out += Expr(t.substring(2, t.length - 2).trim)
      else if (t.startsWith("{%")) out += Stmt(t.substring(2, t.length - 2).trim)
      // {# comments #} emit nothing
      last = m.end
    }
    if (last < s.length) out += Raw(s.substring(last))
    out.result()
  }

  /** Parse until one of `closers` ("endfor"/"endif") or end of input;
    * returns (nodes, remaining-after-closer-consumed-check) — the closer
    * token itself is left for the caller to inspect via the returned
    * remainder's head having been consumed (we return after consuming). */
  private def parseUntil(toks: List[Tok], closers: Set[String],
                         inLoop: Boolean): (Seq[Node], List[Tok]) = {
    val nodes = Seq.newBuilder[Node]
    var rest = toks
    while (rest.nonEmpty) {
      rest match {
        case Raw(s) :: t => nodes += Text(s); rest = t
        case Expr(s) :: t => nodes += parseOut(s); rest = t
        case Stmt(s) :: t =>
          val word = s.takeWhile(!_.isWhitespace)
          word match {
            case w if closers(w) => return (nodes.result(), t)
            case "for" =>
              val m = raw"for\s+(\w+)\s+in\s+([\w.]+)".r.findFirstMatchIn(s)
                .getOrElse(throw new IllegalArgumentException(s"bad for: {% $s %}"))
              val (body, t2) = parseUntil(t, Set("endfor"), inLoop = true)
              nodes += For(m.group(1), m.group(2).split('.').toSeq, body)
              rest = t2
            case "if" =>
              val (body, t2) = parseUntil(t, Set("endif"), inLoop)
              nodes += If(parseCond(s.drop(2).trim), body)
              rest = t2
            case "break" =>
              // Jinja's loopcontrols extension rejects this at compile
              // time; failing at render would poison every dispatch
              require(inLoop, "{% break %} outside of a {% for %} loop")
              nodes += Break; rest = t
            case other => throw new IllegalArgumentException(
              s"unsupported template statement: {% $other … %} " +
                "(supported: for/endfor, if/endif, break)")
          }
        case Nil => ()
      }
    }
    require(closers.isEmpty, s"missing ${closers.mkString("/")} tag")
    (nodes.result(), Nil)
  }

  private def parseOut(s: String): Out = {
    val parts = splitTop(s, '|')
    val path = parts.head.trim.split('.').toSeq
    val filters = parts.tail.map { f =>
      val ft = f.trim
      val i = ft.indexOf('(')
      if (i < 0) (ft, None)
      else {
        require(ft.endsWith(")"), s"bad filter: $ft")
        val arg = ft.substring(i + 1, ft.length - 1).trim
        (ft.substring(0, i), Some(unquote(arg)))
      }
    }
    Out(path, filters)
  }

  /** Split on `sep` outside of quotes and parens. */
  private def splitTop(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0; var quote = ' '
    s.foreach { c =>
      if (quote != ' ') { cur += c; if (c == quote) quote = ' ' }
      else if (c == '"' || c == '\'') { cur += c; quote = c }
      else if (c == '(') { depth += 1; cur += c }
      else if (c == ')') { depth -= 1; cur += c }
      else if (c == sep && depth == 0) { out += cur.result(); cur.clear() }
      else cur += c
    }
    out += cur.result()
    out.result()
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && (s.head == '"' || s.head == '\'') && s.last == s.head)
      s.substring(1, s.length - 1)
    else s

  /** First index of `op` OUTSIDE quoted literals, or -1 — an operator
    * inside a string literal (`s == "a!=b"`) must not split there. */
  private def indexOfTop(s: String, op: String): Int = {
    var i = 0; var quote = ' '
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != ' ') { if (c == quote) quote = ' ' }
      else if (c == '"' || c == '\'') quote = c
      else if (s.startsWith(op, i)) return i
      i += 1
    }
    -1
  }

  private def parseCond(s: String): Cond = {
    def operand(o: String): Operand = {
      val t = o.trim
      if (t.headOption.exists(c => c == '"' || c == '\'')) Lit(unquote(t))
      else if (t.matches("-?\\d+")) Lit(t.toLong)
      else Path(t.split('.').toSeq)
    }
    val ne = indexOfTop(s, "!=")
    val eq = indexOfTop(s, "==")
    if (ne >= 0 && (eq < 0 || ne < eq))
      Cmp(operand(s.substring(0, ne)), operand(s.substring(ne + 2)), eq = false)
    else if (eq >= 0)
      Cmp(operand(s.substring(0, eq)), operand(s.substring(eq + 2)), eq = true)
    else Truthy(s.trim.split('.').toSeq)
  }

  // ------------------------------------------------------------ renderer

  private final class BreakLoop extends RuntimeException

  /** Render `source` with `vars`. `alerts`-style sequences iterate via
    * `{% for %}`; [[Notifications.Alert]] exposes `date`/`message`/`data`
    * (the reference alert object's fields, alerting_dispatcher.py:135-141).
    *
    * With `autoescape = true` every `{{ }}` output is escaped exactly
    * once, matching Jinja + markupsafe: an explicit `|e` yields a Markup
    * value that autoescape does not re-escape.
    */
  def render(source: String, vars: Map[String, Any],
             autoescape: Boolean = false): String = {
    val sb = new StringBuilder
    def emit(nodes: Seq[Node], scope: Map[String, Any]): Unit = nodes.foreach {
      case Text(s) => sb ++= s
      case Out(path, filters) =>
        var v = resolve(path, scope)
        var escaped = false
        filters.foreach { f =>
          v = applyFilter(v, f)
          if (f._1 == "e") escaped = true
        }
        val s = if (v == null) "" else toStr(v)
        sb ++= (if (autoescape && !escaped) escape(s) else s)
      case For(name, path, body) =>
        val xs = resolve(path, scope) match {
          case s: Seq[_] => s
          case null => Seq.empty
          case one => Seq(one)
        }
        try xs.zipWithIndex.foreach { case (x, i) =>
          emit(body, scope + (name -> x) + ("loop" -> Map(
            "index" -> (i + 1L), "first" -> (i == 0),
            "last" -> (i == xs.size - 1))))
        } catch { case _: BreakLoop => () }
      case If(cond, body) => if (eval(cond, scope)) emit(body, scope)
      case Break => throw new BreakLoop
    }
    emit(parse(source), vars)
    sb.result()
  }

  private def resolve(path: Seq[String], scope: Map[String, Any]): Any =
    path.foldLeft(scope: Any) {
      case (m: Map[String @unchecked, Any @unchecked], k) => m.getOrElse(k, null)
      case (a: Notifications.Alert, k) => k match {
        case "date" => a.created
        case "message" => a.message
        case "data" => a.payload
        case _ => null
      }
      case (null, _) => null
      case (_, _) => null
    }

  private def eval(c: Cond, scope: Map[String, Any]): Boolean = c match {
    case Truthy(p) => resolve(p, scope) match {
      case null => false
      case b: Boolean => b
      case s: String => s.nonEmpty
      case n: Long => n != 0L
      case n: Int => n != 0
      case s: Seq[_] => s.nonEmpty
      case _ => true
    }
    case Cmp(a, b, eq) =>
      def v(o: Operand): Any = o match {
        case Lit(x) => x
        case Path(p) => resolve(p, scope)
      }
      // numeric compare is width-insensitive (10 == loop.index)
      def norm(x: Any): Any = x match {
        case i: Int => i.toLong
        case other => other
      }
      (norm(v(a)) == norm(v(b))) == eq
  }

  private def toStr(v: Any): String = v match {
    case ts: java.sql.Timestamp => strftime(ts, "%Y-%m-%dT%H:%M:%S%z")
    case other => other.toString
  }

  private def applyFilter(v: Any, f: (String, Option[String])): Any = f match {
    case ("e", _) => escape(if (v == null) "" else toStr(v))
    case ("datetime", fmt) => v match {
      case ts: java.sql.Timestamp =>
        strftime(ts, fmt.getOrElse("%Y-%m-%dT%H:%M:%S%z"))
      case other => other
    }
    case (name, _) => throw new IllegalArgumentException(
      s"unsupported template filter: $name (supported: e, datetime)")
  }

  /** markupsafe's escape order/entities (jinja autoescape). */
  def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("'", "&#39;").replace("\"", "&#34;")

  /** strftime subset over UTC — the fields the notification templates
    * use; unknown directives throw rather than render garbage. */
  def strftime(ts: java.sql.Timestamp, fmt: String): String = {
    val cal = java.util.Calendar.getInstance(
      java.util.TimeZone.getTimeZone("UTC"))
    cal.setTimeInMillis(ts.getTime)
    def p2(n: Int) = f"$n%02d"
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      if (fmt.charAt(i) == '%' && i + 1 < fmt.length) {
        fmt.charAt(i + 1) match {
          case 'Y' => sb ++= cal.get(java.util.Calendar.YEAR).toString
          case 'm' => sb ++= p2(cal.get(java.util.Calendar.MONTH) + 1)
          case 'd' => sb ++= p2(cal.get(java.util.Calendar.DAY_OF_MONTH))
          case 'H' => sb ++= p2(cal.get(java.util.Calendar.HOUR_OF_DAY))
          case 'M' => sb ++= p2(cal.get(java.util.Calendar.MINUTE))
          case 'S' => sb ++= p2(cal.get(java.util.Calendar.SECOND))
          case 'z' => sb ++= "+0000" // rendered in UTC
          case '%' => sb += '%'
          case other => throw new IllegalArgumentException(
            s"unsupported strftime directive %$other")
        }
        i += 2
      } else { sb += fmt.charAt(i); i += 1 }
    }
    sb.result()
  }
}
