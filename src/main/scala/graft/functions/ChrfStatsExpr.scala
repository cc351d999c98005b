package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * All chrF per-order statistics in ONE row-local pass: for each order
 * n = 1..maxN, the clipped char n-gram overlap and the two gram counts —
 * flattened as [o_1, ng_1, nr_1, ..., o_maxN, ng_maxN, nr_maxN].
 *
 * Replaces 12 shingle-array materializations + 6 ClippedOverlap hash
 * passes per row with one pass per order over two strings and zero
 * ArrayData intermediates (measured 2.1 s → sub-second on the chrF gate).
 * Counting uses the strict convention: a text shorter than n has ZERO
 * n-grams at order n (chrF semantics — NOT wordShingles' whole-string
 * fallback). Windows are code-point-based, matching Spark substring /
 * DuckDB substr.
 */
case class ChrfStatsExpr(left: Expression, right: Expression, maxN: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"chrf_stats needs (string, string), got ($l, $r)")
    }

  protected override def nullSafeEval(a: Any, b: Any): Any =
    ChrfStatsExpr.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], maxN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ChrfStatsExpr.compute($a, $b, $maxN)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "chrf_stats"
}

object ChrfStatsExpr {

  /** Called from generated code. */
  def compute(ua: UTF8String, ub: UTF8String, maxN: Int): ArrayData = {
    val a = ua.toString
    val b = ub.toString
    val out = new Array[Int](3 * maxN)
    // loop-invariant: one O(len) codepoint scan per side, not one per order
    val ca = a.codePointCount(0, a.length)
    val cb = b.codePointCount(0, b.length)
    var n = 1
    while (n <= maxN) {
      val na = math.max(ca - n + 1, 0)
      val nb = math.max(cb - n + 1, 0)
      var o = 0
      if (na > 0 && nb > 0) {
        val counts = new java.util.HashMap[String, Array[Int]]()
        var ci = 0
        var i = 0
        while (i < na) {
          val end = a.offsetByCodePoints(ci, n)
          val k = a.substring(ci, end)
          val c = counts.get(k)
          if (c == null) counts.put(k, Array(1, 0)) else c(0) += 1
          ci = a.offsetByCodePoints(ci, 1)
          i += 1
        }
        ci = 0
        i = 0
        while (i < nb) {
          val end = b.offsetByCodePoints(ci, n)
          val c = counts.get(b.substring(ci, end))
          if (c != null) c(1) += 1
          ci = b.offsetByCodePoints(ci, 1)
          i += 1
        }
        val it = counts.values().iterator()
        while (it.hasNext) {
          val c = it.next()
          o += math.min(c(0), c(1))
        }
      }
      out(3 * (n - 1)) = o
      out(3 * (n - 1) + 1) = na
      out(3 * (n - 1) + 2) = nb
      n += 1
    }
    new GenericArrayData(out)
  }
}
