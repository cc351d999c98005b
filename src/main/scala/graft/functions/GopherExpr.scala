package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * The Gopher document-quality counts (Rae et al. 2021, "Scaling Language
 * Models: ... Gopher", Appendix A1.1 — the rule set MassiveText filtered
 * with, since reused by most open pre-training pipelines) in ONE
 * codegen'd pass. The published rules need, per document:
 *
 *  - word count (whitespace tokens) and mean word length
 *  - fraction of words containing an alphabetic character
 *  - '#' and '...' symbol-to-word ratios
 *  - fraction of lines starting with a bullet / ending with an ellipsis
 *  - presence of >= 2 distinct words from a fixed 8-stopword list
 *    (the, be, to, of, and, that, have, with)
 *
 * All outputs are EXACT integer counts, so the keep-decision thresholds
 * (see [[gf.gopherKeep]]) are integer comparisons — 10*n_hash <= n_words
 * instead of n_hash/n_words <= 0.1 — and the DuckDB oracle hash-matches
 * bit-for-bit with no float hazards.
 *
 * Cross-engine semantics (mirrored by the q_gopher_quality oracle):
 * words = nonempty pieces of regexp-split on the JAVA \s class
 * [ \t\n\x0B\f\r] — the oracle pins that exact class because RE2's \s
 * excludes \x0B; word length
 * in code points; lines = split on \n alone (a \r survives at the line
 * end and defeats the ellipsis test in BOTH engines); bullet = first
 * non-space char in {•, *, -}; line-ellipsis = space-right-trimmed line
 * ending with "..." or …; "..." occurrences count non-overlapping
 * left-to-right (floor(run/3) per maximal dot run), exactly Java/SQL
 * replace semantics.
 */
case class GopherStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = GopherStatsExpr.Schema
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"gopher_stats needs string, got $other")
  }

  protected override def nullSafeEval(input: Any): Any =
    GopherStatsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GopherStatsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "gopher_stats"
}

object GopherStatsExpr {

  val Schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_alpha_words", LongType, nullable = false),
    StructField("word_char_sum", LongType, nullable = false),
    StructField("n_hash", LongType, nullable = false),
    StructField("n_ellipsis", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("n_bullet_lines", LongType, nullable = false),
    StructField("n_ellipsis_lines", LongType, nullable = false),
    StructField("n_stop_distinct", LongType, nullable = false)))

  /** The paper's fixed stopword list — presence of >= 2 DISTINCT members
    * is the rule, hence a bitmask rather than a counter. */
  val StopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private val Bullet1 = '\u2022' // •
  private val Ellipsis1 = '\u2026' // …

  /** Called from generated code. */
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val n = str.length
    var nWords = 0L; var nAlphaWords = 0L; var charSum = 0L
    var nHash = 0L; var nEllipsis = 0L
    var nLines = 0L; var nBullet = 0L; var nEllLines = 0L
    var stopMask = 0
    // word state
    var wLen = 0L; var wAlpha = false
    val wb = new java.lang.StringBuilder(4)
    // dot-run state (non-overlapping "..." like replace)
    var dotRun = 0L
    // line state: first non-space char; last-3-chars snapshot taken at the
    // most recent non-space char (so trailing spaces are ignored)
    var firstNonSpace = ' '
    var prev1 = ' '; var prev2 = ' ' // the two chars before the current one
    var s0 = ' '; var s1 = ' '; var s2 = ' '
    def flushWord(): Unit = if (wLen > 0) {
      nWords += 1
      charSum += wLen
      if (wAlpha) nAlphaWords += 1
      if (wLen >= 2 && wLen <= 4) {
        val w = wb.toString
        var k = 0
        while (k < GopherStatsExpr.StopWords.length) {
          if (GopherStatsExpr.StopWords(k) == w) stopMask |= 1 << k
          k += 1
        }
      }
      wb.setLength(0); wLen = 0L; wAlpha = false
    }
    def flushDots(): Unit = { nEllipsis += dotRun / 3; dotRun = 0L }
    def flushLine(): Unit = {
      nLines += 1
      if (firstNonSpace == Bullet1 || firstNonSpace == '*' || firstNonSpace == '-')
        nBullet += 1
      if ((s0 == '.' && s1 == '.' && s2 == '.') || s0 == Ellipsis1) nEllLines += 1
      firstNonSpace = ' '
      prev1 = ' '; prev2 = ' '; s0 = ' '; s1 = ' '; s2 = ' '
    }
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      val cw = Character.charCount(cp)
      val bmp = if (cw == 1) str.charAt(i) else '\uFFFD' // non-BMP: never ws/./#
      // symbol counts
      if (bmp == '#') nHash += 1
      if (bmp == '.') dotRun += 1 else flushDots()
      if (bmp == Ellipsis1) nEllipsis += 1
      // word accounting (\s is BMP-only, so supplementary cps are word chars)
      if (cw == 1 && Chars.isJavaWs(bmp)) flushWord()
      else {
        wLen += 1
        if (cw == 1 && ((bmp >= 'a' && bmp <= 'z') || (bmp >= 'A' && bmp <= 'Z')))
          wAlpha = true
        // ASCII-only case folding: per-code-point Character.toLowerCase
        // maps U+0130 İ to plain 'i' where SQL lower() yields i+combining
        // dot — folding only A-Z keeps "no match" outcomes identical in
        // both engines (the 8 targets are pure ASCII)
        if (wLen <= 4) {
          if (cp >= 'A' && cp <= 'Z') wb.append((cp + 32).toChar)
          else wb.appendCodePoint(cp)
        }
      }
      // line accounting
      if (bmp == '\n') flushLine()
      else {
        if (firstNonSpace == ' ' && bmp != ' ') firstNonSpace = bmp
        // snapshot BEFORE rolling: s* = last 3 chars of the line as of
        // this (non-space) char — interior spaces included via prev1/2
        if (bmp != ' ') { s2 = prev2; s1 = prev1; s0 = bmp }
        prev2 = prev1; prev1 = bmp
      }
      i += cw
    }
    flushWord(); flushDots(); flushLine()
    new GenericInternalRow(Array[Any](nWords, nAlphaWords, charSum, nHash,
      nEllipsis, nLines, nBullet, nEllLines, Integer.bitCount(stopMask).toLong))
  }
}
