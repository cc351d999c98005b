package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Double-space floor: `Math.floor(x)` as ONE codegen'd expression node.
 *
 * Exists because neither built-in form fits gf.roundHalfUp's hot path:
 * Spark's floor() returns BIGINT (overflow-clamps at |x| > 2^63 — it ate
 * q_moments' m2·1e6), and the algebraic twin `y - pmod(y, 1)` references
 * its child TWICE — fine under Project/Aggregate codegen (subexpression
 * elimination), but FilterExec generates no CSE, so a predicate like
 * Sampling.byWeight(qualityScore(text)) re-evaluated the entire quality
 * blend per reference (+60% on q_weighted_sample at sf0.1). A unary node
 * evaluates the child exactly once everywhere.
 *
 * Math.floor matches DuckDB's double-returning floor() at every magnitude
 * (largest double <= x; NaN/±Inf/−0.0 pass through per IEEE).
 */
case class FloorDoubleExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"floor_double needs double, got $other")
  }

  protected override def nullSafeEval(input: Any): Any =
    math.floor(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Math.floor($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "floor_double"
}
