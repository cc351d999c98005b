package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Maximum multiplicity of any element in a string array, in one hash pass —
 * the row-local core of the Gopher top-n-gram repetition signal. A
 * relational formulation (explode -> two-level aggregate -> join back)
 * shuffles every (doc, ngram) pair for a statistic that never leaves the
 * row; this keeps it inside whole-stage codegen with zero exchanges.
 */
case class TopCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_count needs array<string>, got $other")
  }

  protected override def nullSafeEval(input: Any): Any =
    TopCountExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TopCountExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "top_count"
}

/**
 * Word n-gram shingles over a token array, in one pass. The previous
 * Column-composition form (`transform(sequence(...), i -> concat_ws(" ",
 * slice(tokens, i+1, n)))`) re-evaluated the WHOLE token expression —
 * regexp_replace + trim + lower + split — once per shingle position,
 * because higher-order-function lambdas get no subexpression elimination:
 * O(len²) work per row for an O(len) result. Here the token array is the
 * child (evaluated once) and the windows are a tight loop.
 *
 * Output contract is unchanged (and matched by the DuckDB oracles):
 * positions 0..max(len-n, 0), window = tokens[i, min(i+n, len)) joined by
 * one space, so texts shorter than n tokens yield one all-tokens shingle.
 */
case class WordShinglesExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles needs array<string>, got $other")
  }

  protected override def nullSafeEval(input: Any): Any =
    WordShinglesExpr.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShinglesExpr.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

object WordShinglesExpr {
  private val Space = UTF8String.fromString(" ")

  /** Called from generated code. */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val outLen = math.max(len - n, 0) + 1
    val out = new Array[AnyRef](outLen)
    var i = 0
    while (i < outLen) {
      val end = math.min(i + n, len)
      val window = new Array[UTF8String](end - i)
      var j = i
      while (j < end) {
        window(j - i) = if (arr.isNullAt(j)) null else arr.getUTF8String(j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, window: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object TopCountExpr {
  /** Called from generated code. Null elements are skipped. */
  def compute(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n == 0) return 0
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val c = counts.getOrDefault(s, 0) + 1
        counts.put(s, c)
        if (c > best) best = c
      }
      i += 1
    }
    best
  }
}
