package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode NFC normalization as a codegen'd expression — the standard first
 * step of corpus text cleaning (decomposed accents, compatibility forms
 * from OCR/PDF extraction, web copy-paste). Spark has no built-in
 * normalizer; this wraps `java.text.Normalizer` (UAX #15) with a
 * fast-path: `isNormalized` is O(n) with no allocation, and real-world
 * corpora are overwhelmingly already NFC.
 */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"nfc_normalize needs string, got $other")
  }

  protected override def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalizeExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

object NfcNormalizeExpr {
  /** Called from generated code. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/**
 * CCNet-style dedup-key normalization as ONE codegen'd expression
 * (Wenzek et al. 2020, text_normalizer.py in the public CCNet repo):
 * lowercase, strip accents (NFD -> drop combining marks), replace every
 * digit run and punctuation with a space, collapse whitespace, trim.
 * Two near-identical boilerplate variants ("Copyright © 2023…" vs
 * "copyright 2024…") then share one exact-dedup key. A composed
 * regexp_replace chain would rescan the string once per rule; this is a
 * single pass plus at most one NFD pass when accents are present.
 */
case class DedupKeyExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"dedup_key needs string, got $other")
  }

  protected override def nullSafeEval(input: Any): Any =
    DedupKeyExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DedupKeyExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "dedup_key"
}

/**
 * Stopword-argmax language id as ONE codegen'd pass. The Column-built
 * formulation (`array_max(array(struct(size(filter(tokens, isin ...)))))`)
 * duplicated the tokenization under five lambda functions — Catalyst's
 * subexpression elimination skips LambdaFunction children, so every row
 * tokenized five times and ran 5x13 isin probes per token. This walks the
 * string once, hashes each lowercased token against a precomputed
 * word -> language table, and arg-maxes the counts. Semantics are
 * IDENTICAL to the Column form (and to the DuckDB oracle at
 * SparkEntry q_langid): token = whitespace-split of trim(lower(text)),
 * ties break to the lexicographically LAST language (array_max struct
 * ordering), zero hits -> "und" — INCLUDING null input -> "und", which
 * the when(...).otherwise(lit("und")) Column form produced (a null
 * predicate falls through to the otherwise branch), so this expression
 * is never-null rather than null-propagating.
 */
case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"lang_id needs string, got $other")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) LangIdExpr.Und else LangIdExpr.compute(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        UTF8String ${ev.value} = ${childGen.isNull}
          ? graft.functions.LangIdExpr.Und()
          : graft.functions.LangIdExpr.compute(${childGen.value});
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "lang_id"
}

object LangIdExpr {
  /** Languages in ascending order — ties resolve to the LAST hit-carrying
    * index, matching array_max over (score, lang) structs. */
  val Langs: Array[String] = gf.StopwordsByLang.keys.toArray.sorted

  /** word -> indices of EVERY language listing it ("la" is Spanish AND
    * French; "un", "de", "que", "en" overlap too — a single-language map
    * would count shared stopwords for only one side). */
  private val wordToLangs: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    Langs.zipWithIndex.foreach { case (lang, i) =>
      gf.StopwordsByLang(lang).foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }

  private val results: Array[UTF8String] =
    Langs.map(UTF8String.fromString) :+ UTF8String.fromString("und")

  /** Null input -> "und" (callable from generated code). */
  def Und(): UTF8String = results(Langs.length)

  /** Java-regex \s — the ONE shared definition (Chars.isJavaWs), which
    * the Column form's split(..., "\\s+") and the RE2 oracle both match. */
  private def isTokenSep(c: Char): Boolean = Chars.isJavaWs(c)

  /** Called from generated code. One pass: split on whitespace, lowercase
    * each token into a reusable buffer, count table hits per language. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    val counts = new Array[Int](Langs.length)
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    val n = str.length
    while (i <= n) {
      val atEnd = i == n
      val c = if (atEnd) ' ' else str.charAt(i)
      if (atEnd || isTokenSep(c)) {
        if (sb.length > 0) {
          // full-string lowercase (Locale.ROOT), NOT per-char
          // Character.toLowerCase: the SQL oracle's lower() maps Turkish
          // U+0130 to 'i'+combining-dot (two chars) where the per-char
          // form yields bare 'i' — the counts must agree with the oracle
          // on such text. ASCII (the common case) takes the fast path
          // inside String.toLowerCase anyway.
          val hits = wordToLangs.get(
            sb.toString.toLowerCase(java.util.Locale.ROOT))
          if (hits != null) {
            var h = 0
            while (h < hits.length) { counts(hits(h)) += 1; h += 1 }
          }
          sb.setLength(0)
        }
      } else sb.append(c)
      i += 1
    }
    var best = -1; var bestScore = 0
    var k = 0
    while (k < counts.length) {
      // >= : later (lexicographically larger) language wins ties
      if (counts(k) > 0 && counts(k) >= bestScore) { best = k; bestScore = counts(k) }
      k += 1
    }
    if (best < 0) results(Langs.length) else results(best)
  }
}

object DedupKeyExpr {
  /** Called from generated code. */
  def compute(s: UTF8String): UTF8String = {
    var str = s.toString
    // decompose only when needed: isNormalized(NFD) is allocation-free and
    // pure-ASCII text (the common case) short-circuits
    if (!java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFD))
      str = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(str.length)
    var lastSpace = true // leading spaces are dropped (implicit trim)
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      val t = Character.getType(cp)
      if (t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
          t == Character.ENCLOSING_MARK) {
        // accent stripped
      } else if (Character.isLetter(cp)) {
        sb.appendCodePoint(Character.toLowerCase(cp))
        lastSpace = false
      } else {
        // digits, punctuation, symbols, whitespace -> one separating space
        if (!lastSpace) { sb.append(' '); lastSpace = true }
      }
    }
    // implicit trailing trim
    var end = sb.length
    if (end > 0 && sb.charAt(end - 1) == ' ') end -= 1
    UTF8String.fromString(sb.substring(0, end))
  }
}
