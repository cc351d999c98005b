package graft.dedup

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/**
 * Random-hyperplane LSH sign bucket (k planes -> k-bit bucket id) as ONE
 * Catalyst expression. An earlier Column-composition version expanded to
 * planes x dim literal nodes (`element_at(vec, i) * lit(h)` summed) — the
 * same plan-bloat shape NearestCentroidExpr was created to kill: at
 * planes=16 over d=1536 that is ~25k expression nodes per reference to the
 * bucket column. Here the plane matrix rides as one reference object and
 * the generated code calls a tight JVM loop; the plan holds a single node
 * regardless of planes x dim.
 */
case class SignBucketExpr(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_bucket needs array<float> or array<double>, got $other")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected override def nullSafeEval(input: Any): Any =
    SignBucketExpr.compute(input.asInstanceOf[ArrayData], isFloat, planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ps = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.dedup.SignBucketExpr.compute($c, $isFloat, $ps)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "sign_bucket"
}

object SignBucketExpr {

  /** Deterministic pseudo-random hyperplane coefficients in [-1, 1),
    * derived from (seed, plane, dim index) via a splitmix-style mix —
    * the same stream the Column-composition formulation used, so buckets
    * are stable across engine versions. */
  def hyperplanes(planes: Int, dim: Int, seed: Int): Array[Array[Double]] =
    Array.tabulate(planes, dim) { (p, i) =>
      ((java.lang.Long.rotateLeft(0x9e3779b97f4a7c15L * (seed + p * 1315423911L + i), 17)
        >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }

  /** Bit p = sign of dot(vec, plane_p); left-to-right accumulation matches
    * the old Column fold exactly. Called from generated code. */
  def compute(arr: ArrayData, isFloat: Boolean, planes: Array[Array[Double]]): Long = {
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val h = planes(p)
      var dot = 0.0
      var i = 0
      val n = math.min(arr.numElements(), h.length)
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        dot += x * h(i)
        i += 1
      }
      if (dot >= 0) bucket += (1L << p)
      p += 1
    }
    bucket
  }
}
