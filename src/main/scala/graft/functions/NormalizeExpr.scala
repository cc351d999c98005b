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
