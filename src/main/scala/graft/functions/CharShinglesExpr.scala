package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Character n-gram shingles in one pass. The Column-composition form
 * (`transform(sequence(0, len-n), i -> substring(s, 1+i, n))`) runs
 * INTERPRETED — HOF lambdas get no codegen — and allocates a boxed
 * Integer sequence plus a per-window expression evaluation: measured
 * 5.6 s of the chrF gate at sf0.1 for what is a linear scan.
 *
 * Contract identical to the old form (and the DuckDB oracles): windows at
 * code-point positions 0..max(len−n, 0), each window min(n, len−i) code
 * points — a text shorter than n yields ONE whole-string shingle.
 * Code-point semantics match Spark's own substring/length and DuckDB's
 * substr/length.
 */
case class CharShinglesExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_shingles needs string, got $other")
  }

  protected override def nullSafeEval(input: Any): Any =
    CharShinglesExpr.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharShinglesExpr.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "char_shingles"
}

object CharShinglesExpr {

  /** Called from generated code. */
  def compute(u: UTF8String, n: Int): ArrayData = {
    val s = u.toString
    val chars = s.length
    // code-point start offsets (char indices); ASCII/BMP text has
    // starts(i) == i, the loop just walks chars
    val cp = s.codePointCount(0, chars)
    val starts = new Array[Int](cp + 1)
    var ci = 0
    var i = 0
    while (i < cp) { starts(i) = ci; ci = s.offsetByCodePoints(ci, 1); i += 1 }
    starts(cp) = chars
    val outLen = math.max(cp - n, 0) + 1
    val out = new Array[AnyRef](outLen)
    i = 0
    while (i < outLen) {
      val end = math.min(i + n, cp)
      out(i) = UTF8String.fromString(s.substring(starts(i), starts(end)))
      i += 1
    }
    new GenericArrayData(out)
  }
}
