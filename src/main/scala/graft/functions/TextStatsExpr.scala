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

/**
 * Flesch-Kincaid readability counts in ONE regex-free codegen'd pass —
 * the expression form of [[gf.readabilityStats]]. The composed Column
 * form ran three regexp_extract_all scans plus an rlike under a
 * higher-order filter; HigherOrderFunction bodies evaluate interpreted
 * and defeat subexpression elimination (the TextStatsExpr lesson),
 * measured as q_readability costing 6x a comparable single-pass scan.
 *
 * Field semantics are BIT-IDENTICAL to the replaced Column form (and
 * the q_readability DuckDB oracle):
 *  - n_words     = size(split(trim(lower(text)), "\\s+")), 0 for
 *                  space-trim-empty text (split keeps empty end tokens —
 *                  see TextStatsExpr.n_tokens)
 *  - n_sentences = max(1, count of [.!?]+ runs over the RAW text),
 *                  0 when empty
 *  - n_syllables = count of [aeiouy]+ runs over lower(text) plus one per
 *                  token containing NO vowel (empty end tokens included,
 *                  exactly like filter(toks, !rlike) counted them)
 *  - fk_milli    = max(0, 390W² + 11800YS − 15590WS) / (W·S), truncated
 */
case class ReadabilityExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ReadabilityExpr.Schema
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"readability needs string, got $other")
  }

  protected override def nullSafeEval(input: Any): Any =
    ReadabilityExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ReadabilityExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "readability"
}

object ReadabilityExpr {
  import Chars.{isJavaWs => isTokenSep}

  val Schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_sentences", LongType, nullable = false),
    StructField("n_syllables", LongType, nullable = false),
    StructField("fk_milli", LongType, nullable = false)))

  /** Called from generated code. */
  def compute(s: UTF8String): InternalRow = {
    // sentence runs over the RAW text ([.!?] is case-blind anyway)
    val raw = s.toString
    var sRuns = 0L
    var inSRun = false
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      val isS = c == '.' || c == '!' || c == '?'
      if (isS) { if (!inSRun) { sRuns += 1; inSRun = true } }
      else inSRun = false
      i += 1
    }
    // token + vowel walk over trim(lower(text)) — same space-only trim
    // and lowercase as the Column form. Vowel classes are ASCII chars,
    // so charAt stepping is safe (surrogates are never ASCII).
    val str = s.toLowerCase.trim().toString
    if (str.isEmpty)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L, 0L))
    var nTokens = 1L; var vowelless = 0L; var vowelGroups = 0L
    var sawVowel = false; var inSep = false; var inVRun = false
    var j = 0
    while (j < str.length) {
      val c = str.charAt(j)
      if (isTokenSep(c)) {
        if (!inSep) {
          if (!sawVowel) vowelless += 1
          sawVowel = false
          nTokens += 1
          inSep = true
        }
        inVRun = false
      } else {
        inSep = false
        val isV = c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'
        if (isV) {
          sawVowel = true
          if (!inVRun) { vowelGroups += 1; inVRun = true }
        } else inVRun = false
      }
      j += 1
    }
    // close the final token: a trailing separator run leaves a trailing
    // EMPTY token (split keeps it), which counts as vowel-less
    if (!inSep) { if (!sawVowel) vowelless += 1 }
    else vowelless += 1
    val w = nTokens
    val sCnt = math.max(1L, sRuns)
    val y = vowelGroups + vowelless
    val num = math.max(0L, 390L * w * w + 11800L * y * sCnt - 15590L * w * sCnt)
    val fk = num / (w * sCnt)
    new GenericInternalRow(Array[Any](w, sCnt, y, fk))
  }
}

/**
 * T5 block-aligned span corruption in ONE codegen'd pass — the
 * expression form of [[gf.spanCorrupt]] (whose HOF composition walked
 * the token array under four interpreted LambdaFunctions per row).
 * Semantics are BIT-IDENTICAL to the Column form and the
 * q_span_corrupt oracle: tokens are split(trim(text), "\\s+") segments
 * INCLUDING empty end tokens; block b of 10 masks its last 3 tokens
 * behind sentinel `<x_b>` iff polyFingerprint(id:":sc:":b) % 4 == 0
 * and the block is full; input/target are the flattened block pieces
 * joined with single spaces.
 */
case class SpanCorruptExpr(idStr: Expression, text: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = idStr
  override def right: Expression = text
  override def dataType: DataType = SpanCorruptExpr.Schema
  override def checkInputDataTypes(): TypeCheckResult =
    (idStr.dataType, text.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"span_corrupt needs (string, string), got $other")
    }

  protected override def nullSafeEval(id: Any, t: Any): Any =
    SpanCorruptExpr.compute(id.asInstanceOf[UTF8String], t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SpanCorruptExpr.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(idStr = newLeft, text = newRight)
  override def prettyName: String = "span_corrupt"
}

object SpanCorruptExpr {
  import Chars.{isJavaWs => isSep}

  val Schema: StructType = StructType(Seq(
    StructField("input", StringType, nullable = false),
    StructField("target", StringType, nullable = false),
    StructField("n_masked", LongType, nullable = false)))

  private def fp(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  /** Called from generated code. */
  def compute(id: UTF8String, text: UTF8String): InternalRow = {
    val str = text.trim().toString
    if (str.isEmpty)
      return new GenericInternalRow(Array[Any](
        UTF8String.EMPTY_UTF8, UTF8String.EMPTY_UTF8, 0L))
    // split(trim, "\s+") with limit -1: segments between maximal \s runs,
    // keeping empty tokens at both ends
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder()
    var inSep = false
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (isSep(c)) {
        if (!inSep) { toks += sb.toString; sb.setLength(0); inSep = true }
      } else { inSep = false; sb.append(c) }
      i += 1
    }
    toks += sb.toString
    val n = toks.length
    val idS = id.toString
    val input = new java.lang.StringBuilder()
    val target = new java.lang.StringBuilder()
    var nMasked = 0L
    // element COUNTS, not buffer lengths: array_join puts a separator
    // between every pair of elements even when one is the empty token
    var inCount = 0; var tgtCount = 0
    def appendTok(out: java.lang.StringBuilder, t: String): Unit = {
      val c = if (out eq input) inCount else tgtCount
      if (c > 0) out.append(' ')
      out.append(t)
      if (out eq input) inCount += 1 else tgtCount += 1
    }
    val nBlocks = (n + 9) / 10
    var b = 0
    while (b < nBlocks) {
      val start = b * 10
      val full = start + 10 <= n
      val masked = full && fp(idS + ":sc:" + b) % 4L == 0L
      if (masked) {
        nMasked += 1
        val sentinel = "<x_" + b + ">"
        var k = start
        while (k < start + 7) { appendTok(input, toks(k)); k += 1 }
        appendTok(input, sentinel)
        appendTok(target, sentinel)
        k = start + 7
        while (k < start + 10) { appendTok(target, toks(k)); k += 1 }
      } else {
        var k = start
        val end = math.min(start + 10, n)
        while (k < end) { appendTok(input, toks(k)); k += 1 }
      }
      b += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(input.toString),
      UTF8String.fromString(target.toString), nMasked))
  }
}
