package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization for dedup/retrieval keys: NFC normalization,
  * then optional per-codepoint lowercasing, then optional accent
  * stripping (NFD → drop all combining marks → NFC). Two visually equal
  * strings with different byte sequences (composed vs decomposed é,
  * width/case variants of the same word) otherwise hash apart and defeat
  * every hash-keyed operator in the engine — exact dedup, MinHash
  * shingles, gram decontamination, BM25 terms.
  *
  * Bit-portability contract (the point of the specific choices):
  *  - lowercase is the SIMPLE per-codepoint mapping
  *    (`Character.toLowerCase`), matching utf8proc/DuckDB `lower`;
  *    `String.toLowerCase` applies full/contextual Unicode rules (final
  *    sigma ΑΣ→ας, İ→i+combining-dot) that utf8proc does not.
  *  - stripping removes ALL marks (`\p{M}` — nonspacing AND spacing:
  *    DuckDB's strip_accents drops Devanagari matras too), then
  *    recomposes, so `strip_accents(lower(nfc_normalize(s)))` in DuckDB
  *    reproduces the output byte-for-byte (parity-tested incl. ø/ß/
  *    ligature non-decomposition, dakuten, Hangul recomposition).
  *
  * Evaluated as a native codegen expression; the all-ASCII fast path
  * (one vectorizable scan, no Normalizer) makes the common token cheap.
  */
case class NormalizeText(child: Expression, stripAccents: Boolean,
                         lower: Boolean) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize_text"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(NormalizeText.normalize(
      input.asInstanceOf[UTF8String].toString, stripAccents, lower))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.expressions.NormalizeText.normalize(" +
        s"$c.toString(), $stripAccents, $lower))")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  private val Marks = java.util.regex.Pattern.compile("\\p{M}+")

  def normalize(s: String, stripAccents: Boolean, lower: Boolean): String = {
    if (isAscii(s)) {
      if (!lower) s else lowerAscii(s)
    } else {
      var t = Normalizer.normalize(s, Normalizer.Form.NFC)
      if (lower) t = lowerSimple(t)
      if (stripAccents) {
        val d = Normalizer.normalize(t, Normalizer.Form.NFD)
        t = Normalizer.normalize(Marks.matcher(d).replaceAll(""),
          Normalizer.Form.NFC)
      }
      t
    }
  }

  private def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) >= 0x80) return false
      i += 1
    }
    true
  }

  private def lowerAscii(s: String): String = {
    var i = 0
    // allocate only when a change is needed
    while (i < s.length && !(s.charAt(i) >= 'A' && s.charAt(i) <= 'Z')) i += 1
    if (i == s.length) return s
    val b = new java.lang.StringBuilder(s)
    while (i < s.length) {
      val c = b.charAt(i)
      if (c >= 'A' && c <= 'Z') b.setCharAt(i, (c + 32).toChar)
      i += 1
    }
    b.toString
  }

  /** Per-CODEPOINT simple lowercase (no contextual/full mappings). */
  private def lowerSimple(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      b.appendCodePoint(Character.toLowerCase(cp))
    }
    b.toString
  }
}
