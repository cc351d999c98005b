package graft.ann

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/**
 * Nearest-centroid assignment (argmin squared-L2 over a codebook) as a
 * single Catalyst expression.
 *
 * The round-1 version built `array_min(array(struct(d2,cid)...))` with one
 * literal subexpression per (centroid x dimension) — at 10x64 that already
 * produced 1.4 MiB task binaries and a codegen-hostile plan; at a realistic
 * nlist (4k-64k) the plan would not compile at all. Here the codebook rides
 * along as ONE reference object (`ctx.addReferenceObj`): the plan holds a
 * single expression node regardless of nlist, generated code calls a tight
 * JVM loop, and the matrix is shipped once per task binary (which Spark
 * torrent-broadcasts) rather than expanded into expression text.
 *
 * The reference delegates vector search to external stores
 * (lib/sycamore/sycamore/connectors/); this is part of our self-contained
 * ANN surface (SURVEY §2 training-data extension).
 */
case class NearestCentroidExpr(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid needs array<double>, got $other")
  }

  protected override def nullSafeEval(input: Any): Any =
    NearestCentroidExpr.compute(input.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.ann.NearestCentroidExpr.compute($c, $cents)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "nearest_centroid"
}

object NearestCentroidExpr {
  /** Argmin of squared L2 distance; early-abandon when the partial sum
    * already exceeds the best. Called from generated code. */
  def compute(arr: ArrayData, cents: Array[Array[Double]]): Int = {
    val v = arr.toDoubleArray()
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var s = 0.0
      var i = 0
      val n = math.min(v.length, cent.length)
      while (i < n && s < bestD) {
        val d = v(i) - cent(i)
        s += d * d
        i += 1
      }
      if (i == n && s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }
}
