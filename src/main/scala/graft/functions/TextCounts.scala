package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.glue

/** Fused match COUNTERS for the quality/token-estimate signals (t01, t02,
  * t09, p01's quality stage). The built-in forms ran
  * `size(regexp_extract_all(text, pat))` — materializing an array of
  * every match just to take its length, per row, per pattern. Each
  * expression here counts in one walk with zero allocation and is a
  * drop-in for its regex twin:
  *
  *  - [[BpeishCount]]  ≡ `size(regexp_extract_all(text, "[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"))`
  *  - [[PunctCount]]   ≡ `size(regexp_extract_all(text, "[^A-Za-z0-9\s]"))`
  *  - [[StopwordCount]] ≡ `size(regexp_extract_all(input, "\b(w1|…|wn)\b"))`
  *
  * Exactness notes (each is pinned by a differential spec against its
  * regex twin on the corpus plus adversarial rows):
  *  - Java regex matches by CODE POINT; the walks iterate with
  *    `codePointAt`, so astral characters count once, like the regex.
  *  - `\s` without UNICODE_CHARACTER_CLASS is ASCII-only
  *    (space \t \n \x0B \f \r) — non-ASCII whitespace (U+00A0…) is NOT
  *    whitespace to these patterns and the walks agree.
  *  - `\b` in Java is NOT `\w`-based: the engine's boundary test uses
  *    `ch == '_' || Character.isLetterOrDigit(ch)` (Unicode letters ARE
  *    word characters to `\b` even though `\w` is ASCII — the
  *    differential spec caught the ASCII version mis-matching "a的b").
  *    [[StopwordCount]] simulates the engine's scan exactly: at each
  *    position with a leading boundary, alternatives are tried IN LIST
  *    ORDER, a match also requires the trailing boundary, and scanning
  *    resumes past the match (leftmost, non-overlapping). This keeps the
  *    subtle cases — prefix words ("a" vs "and"), the zh profile's CJK
  *    entries (letters to `\b`, so they match only when delimited by
  *    genuine non-word characters) — bit-compatible with the regex the
  *    oracle SQL runs.
  */
case class BpeishCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpeish_count"
  override protected def nullSafeEval(input: Any): Any =
    TextCounts.bpeish(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextCounts$$.MODULE$$.bpeish($c)")
  override protected def withNewChildInternal(newChild: Expression): BpeishCount =
    copy(child = newChild)
}

case class PunctCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "punct_count"
  override protected def nullSafeEval(input: Any): Any =
    TextCounts.punct(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextCounts$$.MODULE$$.punct($c)")
  override protected def withNewChildInternal(newChild: Expression): PunctCount =
    copy(child = newChild)
}

/** Count of `\b(words…)\b` matches in the child string (the caller
  * lowercases in column land when the pattern expects it). `words` is a
  * literal list — part of the expression, not a child. */
case class StopwordCount(child: Expression, words: Seq[String])
    extends UnaryExpression {
  // the fused scan matches words as LITERALS; the composed regex twin
  // (and the oracle SQL) splices them into an alternation — a regex
  // metacharacter or empty entry would make the two silently diverge,
  // so reject such lists at construction instead (review finding)
  require(words.nonEmpty && words.forall(w =>
    w.nonEmpty && w.forall(c => !"\\^$.|?*+()[]{}".contains(c))),
    s"stopword list entries must be non-empty regex-literal words, got: $words")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "stopword_count"
  @transient private lazy val wordArr: Array[String] = words.toArray
  override protected def nullSafeEval(input: Any): Any =
    TextCounts.stopwords(input.asInstanceOf[UTF8String], wordArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("words", words.toArray, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextCounts$$.MODULE$$.stopwords($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): StopwordCount =
    copy(child = newChild)
}

object TextCounts {
  @inline private def isAsciiWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'
  @inline private def isAlpha(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')
  @inline private def isDigit(cp: Int): Boolean = cp >= '0' && cp <= '9'
  // java.util.regex.Pattern's Bound node (UNICODE_CHARACTER_CLASS off):
  // a word character to \b is '_' or any Unicode letter-or-digit
  @inline private def isWordCp(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)

  /** `[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]`: alpha runs count once, digits count
    * per character, anything else non-whitespace counts per code point. */
  def bpeish(text: UTF8String): Int = {
    val s = text.toString
    val n = s.length
    var i = 0
    var cnt = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      if (isAlpha(cp)) {
        cnt += 1
        while (i < n && isAlpha(s.charAt(i))) i += 1
      } else {
        if (!isAsciiWs(cp)) cnt += 1 // digit or punct/other: one match each
        i += Character.charCount(cp)
      }
    }
    cnt
  }

  /** `[^A-Za-z0-9\s]`: one match per non-alnum non-ASCII-ws code point. */
  def punct(text: UTF8String): Int = {
    val s = text.toString
    val n = s.length
    var i = 0
    var cnt = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      if (!isAlpha(cp) && !isDigit(cp) && !isAsciiWs(cp)) cnt += 1
      i += Character.charCount(cp)
    }
    cnt
  }

  /** `\b(w1|…|wn)\b` occurrence count — exact engine simulation: leading
    * boundary gates the attempt, alternatives try in order, trailing
    * boundary required, scan resumes past a match, else advances one char
    * (like Matcher.find's retry). Boundaries are evaluated over CODE
    * POINTS with the engine's own word-char test ('_' or Unicode
    * letter-or-digit); a retry position inside a surrogate pair can never
    * start a match because the words' first chars are BMP. */
  def stopwords(text: UTF8String, words: Array[String]): Int = {
    val s = text.toString
    val n = s.length
    if (n == 0) return 0
    @inline def bnd(i: Int): Boolean =
      if (i == 0) isWordCp(s.codePointAt(0))
      else if (i == n) isWordCp(s.codePointBefore(n))
      else isWordCp(s.codePointBefore(i)) != isWordCp(s.codePointAt(i))
    var i = 0
    var cnt = 0
    while (i < n) {
      var adv = 1
      if (bnd(i)) {
        var k = 0
        var hit = 0
        while (hit == 0 && k < words.length) {
          val w = words(k)
          if (s.startsWith(w, i) && bnd(i + w.length)) hit = w.length
          k += 1
        }
        if (hit > 0) { cnt += 1; adv = hit }
      }
      i += adv
    }
    cnt
  }

  def bpeishCount(text: Column): Column =
    glue.toColumn(BpeishCount(glue.toExpression(text)))
  def punctCount(text: Column): Column =
    glue.toColumn(PunctCount(glue.toExpression(text)))
  def stopwordCount(text: Column, words: Seq[String]): Column =
    glue.toColumn(StopwordCount(glue.toExpression(text), words))
}
