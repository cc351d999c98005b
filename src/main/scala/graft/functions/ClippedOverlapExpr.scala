package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Clipped multiset overlap of two string arrays — Σ over distinct x of
 * min(count_a(x), count_b(x)) — the core of ROUGE-N (Lin 2004: a candidate
 * n-gram is credited at most as many times as the reference contains it).
 *
 * The Column-composition form (`aggregate(array_distinct(a), 0, (acc, t) ->
 * acc + least(size(filter(a, x -> x = t)), size(filter(b, x -> x = t))))`)
 * is O(|distinct a| · (|a| + |b|)) per row AND runs interpreted — HOF
 * lambdas get no codegen and no subexpression elimination. This is the
 * same one-hash-pass O(|a| + |b|) kernel inside whole-stage codegen
 * (TopCountExpr pattern).
 */
case class ClippedOverlapExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"clipped_overlap needs (array<string>, array<string>), got ($l, $r)")
    }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    ClippedOverlapExpr.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ClippedOverlapExpr.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "clipped_overlap"
}

object ClippedOverlapExpr {

  /** Called from generated code. Null array ELEMENTS count as a distinct
    * key like any other value (both sides must agree, which the single
    * map guarantees); null top-level inputs never reach here (BinaryExpression
    * null-intolerant contract). */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val counts = new java.util.HashMap[UTF8String, Array[Int]]()
    var i = 0
    val na = a.numElements()
    while (i < na) {
      val k = if (a.isNullAt(i)) null else a.getUTF8String(i)
      val c = counts.get(k)
      if (c == null) counts.put(k, Array(1, 0)) else c(0) += 1
      i += 1
    }
    i = 0
    val nb = b.numElements()
    while (i < nb) {
      val k = if (b.isNullAt(i)) null else b.getUTF8String(i)
      val c = counts.get(k)
      if (c != null) c(1) += 1
      i += 1
    }
    var sum = 0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      sum += math.min(c(0), c(1))
    }
    sum
  }
}
