package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * The C4 line filter (Raffel et al. 2020 §2.2) as ONE pass returning a
 * struct {clean_text, n_sentences}: keep lines that end in terminal
 * punctuation (. ! ? or closing quote, trailing spaces allowed), carry
 * >= 5 whitespace words, and do not mention javascript; n_sentences
 * counts [.!?] in the kept text.
 *
 * Why an expression and not the Column composition it replaced: the
 * keep-decision needs the cleaned text three times (non-empty, sentence
 * count, the text itself), and a lambda-bearing (filter/array_join)
 * Column subtree is excluded from Catalyst subexpression elimination, so
 * c4Keep re-cleaned every document 3-4x. Struct fields off ONE plain
 * deterministic expression collapse to a single evaluation.
 *
 * Cross-engine semantics (q_c4_clean oracle): lines split on \n alone;
 * terminal check is the right-SPACE-trimmed ending (a trailing \r
 * defeats it in both engines); words split on the JAVA \s class
 * [ \t\n\x0B\f\r] — the oracle pins that exact class, because RE2's \s
 * does NOT include \x0B; javascript match is a lowercase substring.
 */
case class C4StatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = C4StatsExpr.Schema
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"c4_stats needs string, got $other")
  }

  protected override def nullSafeEval(input: Any): Any =
    C4StatsExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.C4StatsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "c4_stats"
}

object C4StatsExpr {

  val Schema: StructType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_sentences", LongType, nullable = false)))

  private def isTerminal(c: Char): Boolean =
    c == '.' || c == '!' || c == '?' || c == '"'

  /** Lowercase ASCII substring check for "javascript" without allocating
    * a lowered copy of the line. */
  private def mentionsJavascript(line: String): Boolean = {
    val needle = "javascript"
    val n = line.length - needle.length
    var i = 0
    while (i <= n) {
      var k = 0
      while (k < needle.length && {
        val c = line.charAt(i + k)
        val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        lc == needle.charAt(k)
      }) k += 1
      if (k == needle.length) return true
      i += 1
    }
    false
  }

  /** One line's keep decision per the C4 rules. */
  private def keepLine(line: String): Boolean = {
    // right-space-trim, then the last char must be terminal punctuation
    var end = line.length
    while (end > 0 && line.charAt(end - 1) == ' ') end -= 1
    if (end == 0 || !isTerminal(line.charAt(end - 1))) return false
    // >= 5 whitespace-separated words (Java \s class)
    var words = 0
    var inWord = false
    var i = 0
    while (i < line.length && words < 5) {
      val c = line.charAt(i)
      if (Chars.isJavaWs(c)) inWord = false
      else if (!inWord) { words += 1; inWord = true }
      i += 1
    }
    if (words < 5) return false
    !mentionsJavascript(line)
  }

  /** Called from generated code. */
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var sentences = 0L
    var start = 0
    val n = str.length
    while (start <= n) {
      val nl = str.indexOf('\n', start)
      val end = if (nl < 0) n else nl
      val line = str.substring(start, end)
      if (keepLine(line)) {
        if (sb.length > 0) sb.append('\n')
        sb.append(line)
        var k = 0
        while (k < line.length) {
          val c = line.charAt(k)
          if (c == '.' || c == '!' || c == '?') sentences += 1
          k += 1
        }
      }
      if (nl < 0) start = n + 1 else start = nl + 1
    }
    new GenericInternalRow(Array[Any](UTF8String.fromString(sb.toString), sentences))
  }
}
