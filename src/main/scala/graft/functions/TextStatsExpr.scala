package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * All the per-document text-quality counts in ONE codegen'd pass — the
 * shared substrate of tokenCount / punctCount / alphaRatio /
 * stopwordRatio / meanTokenLength / qualityScore (the C4/Gopher-style
 * corpus filters; reference: transforms/llm_filter.py and the
 * docset quality metrics).
 *
 * Why an expression and not the Column forms: `stopwordRatio` and
 * `meanTokenLength` each mentioned `tokens(c)` under higher-order
 * functions, and Catalyst's subexpression elimination skips
 * LambdaFunction children — so a q_quality-shaped projection
 * re-tokenized every row 4-5x (measured 0.13 s -> 0.77 s drift on the
 * gate). This expression is a plain deterministic UnaryExpression, so
 * N metric columns over the same text collapse to ONE evaluation under
 * whole-stage-codegen subexpression elimination, and the evaluation
 * itself is regex-free.
 *
 * Field semantics are BIT-IDENTICAL to the replaced Column forms (and
 * to the DuckDB oracles of q_quality / q_token_count / q_quality_score):
 *  - n_chars  = length(text)              — code points of the raw text
 *  - n_alpha  = length minus [a-zA-Z] removed  (ASCII letters only)
 *  - n_punct  = \p{Punct} count           (POSIX punct, ASCII 33-126 ranges)
 *  - n_tokens = size(split(trim(lower(text)), "\\s+")), 0 when
 *               trim(text) is empty — Spark's 2-arg split is
 *               Pattern.split(str, -1), which KEEPS the empty tokens on
 *               both ends when the space-trimmed text starts/ends with
 *               non-space whitespace ("\n\nfoo" -> ["", "foo"],
 *               "foo \n" -> ["foo", ""]); so for nonempty input
 *               n_tokens = (number of maximal \s runs) + 1
 *  - stop_hits = tokens found in [[gf.EnglishStopwords]]
 *  - char_sum  = sum of code-point lengths of the (lowercased) tokens
 *
 * Null input returns null (UnaryExpression), exactly like the replaced
 * forms, whose when(length(trim(NULL))=0) guards also propagated null.
 */
case class TextStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextStatsExpr.Schema
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"text_stats needs string, got $other")
  }

  protected override def nullSafeEval(input: Any): Any =
    TextStatsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "text_stats"
}

/**
 * Shared ASCII character classes for the single-pass text expressions.
 * These anchor DuckDB-oracle bit-compatibility, so there must be exactly
 * ONE definition of each: LangIdExpr, TextStatsExpr and BpeishCountExpr
 * all tokenize/classify with these.
 */
private[functions] object Chars {
  /** The JAVA-regex \s class, exactly: [ \t\n\x0B\f\r] — what Spark's
    * split("\\s+") treats as separators. NOT Character.isWhitespace
    * (adds U+2028 etc.), and NOT RE2's \s either: RE2 \s EXCLUDES
    * \x0B, so every DuckDB oracle spells this class out explicitly
    * ('[ \t\n\x0b\f\r]') instead of using \s. */
  def isJavaWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** ASCII [a-zA-Z0-9]. */
  def isAsciiAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /** POSIX punct (Java \p{Punct}): ASCII 33-47, 58-64, 91-96, 123-126. */
  def isPosixPunct(c: Char): Boolean =
    (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
    (c >= '[' && c <= '`') || (c >= '{' && c <= '~')
}

/**
 * BPE-ish token count as one regex-free pass: the number of matches of
 * `[a-zA-Z0-9]+|[^a-zA-Z0-9\s]` = (maximal ASCII-alnum runs) + (other
 * non-whitespace chars, one token each). Replaces
 * size(regexp_extract_all(...)), which materialized the match array per
 * row just to take its length. Null-propagating like the regex form.
 */
case class BpeishCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"bpeish_count needs string, got $other")
  }

  protected override def nullSafeEval(input: Any): Any =
    BpeishCountExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeishCountExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "bpeish_count"
}

object BpeishCountExpr {
  import Chars.{isAsciiAlnum => isAlnum, isJavaWs => isWs}

  /** Called from generated code. */
  def compute(s: UTF8String): Int = {
    val str = s.toString
    var count = 0
    var inRun = false
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      val cw = Character.charCount(cp)
      if (cp < 128 && isAlnum(cp.toChar)) {
        if (!inRun) { count += 1; inRun = true }
      } else {
        inRun = false
        // \s in Java regex is ASCII-only: non-ASCII whitespace (NBSP etc.)
        // is NOT a separator and counts as a one-char token, exactly like
        // the regex alternation it replaces
        if (!(cp < 128 && isWs(cp.toChar))) count += 1
      }
      i += cw
    }
    count
  }
}

object TextStatsExpr {

  val Schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false),
    StructField("char_sum", LongType, nullable = false)))

  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    gf.EnglishStopwords.foreach(s.add)
    s
  }
  // tokens longer than the longest stopword can never hit the set — the
  // flush below stops buffering past this, so long tokens cost no
  // StringBuilder growth and no toString allocation
  private val maxStopLen: Int = gf.EnglishStopwords.map(_.length).max

  import Chars.{isJavaWs => isTokenSep, isPosixPunct}

  /** Called from generated code. */
  def compute(s: UTF8String): InternalRow = {
    // pass 1: raw-text counts (code points; ASCII classes are BMP chars)
    val raw = s.toString
    var nChars = 0L; var nAlpha = 0L; var nPunct = 0L
    var i = 0
    val rn = raw.length
    while (i < rn) {
      val cp = raw.codePointAt(i)
      nChars += 1
      if (cp < 128) {
        val c = cp.toChar
        if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) nAlpha += 1
        else if (isPosixPunct(c)) nPunct += 1
      }
      i += Character.charCount(cp)
    }
    // pass 2: token stats over trim(lower(text)) — the same UTF8String
    // lowercase and space-only trim the Column form used, so boundaries
    // and lengths agree even on locale-sensitive code points
    val str = s.toLowerCase.trim().toString
    var nTokens = 0L; var stopHits = 0L; var charSum = 0L
    val n = str.length
    if (n > 0) {
      // Pattern.split(str, -1): tokens are the (possibly empty) segments
      // between maximal separator runs, INCLUDING both ends — so
      // n_tokens = sepRuns + 1. Empty end tokens add nothing to
      // char_sum/stop_hits, so only non-empty tokens are materialized.
      nTokens = 1L
      val sb = new java.lang.StringBuilder(16)
      var tokLen = 0L
      var inSep = false
      var j = 0
      while (j <= n) {
        val atEnd = j == n
        val c = if (atEnd) ' ' else str.charAt(j)
        if (atEnd || isTokenSep(c)) {
          if (!inSep) {
            if (tokLen > 0) {
              charSum += tokLen
              if (tokLen <= maxStopLen && stopSet.contains(sb.toString)) stopHits += 1
              sb.setLength(0)
              tokLen = 0L
            }
            if (!atEnd) { nTokens += 1; inSep = true }
          }
          j += 1
        } else {
          inSep = false
          val cp = str.codePointAt(j)
          tokLen += 1 // token length in code points, like length(t)
          if (tokLen <= maxStopLen) sb.appendCodePoint(cp)
          j += Character.charCount(cp)
        }
      }
    }
    new GenericInternalRow(Array[Any](nChars, nAlpha, nPunct, nTokens, stopHits, charSum))
  }
}
